# VQ-KD CLIP teacher on sa_med2d_20m
# (reference configs/vqkd/clip_8192_sa_med2d_20m_ddp.py).
_base_ = [
    "interface.py",
    "teachers/clip.py",
    "../datasets/sa_med2d_20m.py",
    "../strategies/dp.py",
]

trainer = dict(dataset=dict(image_size=224))
validator = dict(dataset=dict(image_size=224))
