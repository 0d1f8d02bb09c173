# Discriminator depth 2 + adaptive-generator-loss-weight gain 0.75
# (reference configs/vqgan/dd2_aglwg075.py).
runner = dict(
    algorithm=dict(discriminator=dict(depth=2), aglw_gain=0.75),
)

_export_ = dict(trainer=runner, validator=runner)
