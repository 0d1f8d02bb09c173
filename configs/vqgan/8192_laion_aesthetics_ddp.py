# VQGAN 8192 on LAION-Aesthetics
# (reference configs/vqgan/8192_laion_aesthetics_ddp.py).
_base_ = [
    "interface.py",
    "../datasets/laion_aesthetics.py",
    "../strategies/dp.py",
]
