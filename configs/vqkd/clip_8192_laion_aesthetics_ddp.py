# VQ-KD CLIP teacher on laion_aesthetics
# (reference configs/vqkd/clip_8192_laion_aesthetics_ddp.py).
_base_ = [
    "interface.py",
    "teachers/clip.py",
    "../datasets/laion_aesthetics.py",
    "../strategies/dp.py",
]

trainer = dict(dataset=dict(image_size=224))
validator = dict(dataset=dict(image_size=224))
