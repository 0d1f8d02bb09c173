# VQGAN 8192 on SATIN (reference configs/vqgan/8192_satin_ddp.py).
_base_ = [
    "interface.py",
    "../datasets/satin.py",
    "../strategies/dp.py",
]
