# VQGAN 8192 on SA-Med2D-20M (reference configs/vqgan/8192_sa_med2d_20m_ddp.py).
_base_ = [
    "interface.py",
    "../datasets/sa_med2d_20m.py",
    "../strategies/dp.py",
]
