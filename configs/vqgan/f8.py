# f8 variant: 3 downsamples instead of 4 (reference configs/vqgan/f8.py:
# encoder width_mults (1,1,2,4), decoder (4,2,1,1)).
runner = dict(
    algorithm=dict(
        model=dict(
            encoder=dict(width_mults=(1, 1, 2, 4)),
            decoder=dict(width_mults=(4, 2, 1, 1)),
        ),
    ),
)

_export_ = dict(trainer=runner, validator=runner)
