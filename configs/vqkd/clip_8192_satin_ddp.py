# VQ-KD CLIP teacher on satin
# (reference configs/vqkd/clip_8192_satin_ddp.py).
_base_ = [
    "interface.py",
    "teachers/clip.py",
    "../datasets/satin.py",
    "../strategies/dp.py",
]

trainer = dict(dataset=dict(image_size=224))
validator = dict(dataset=dict(image_size=224))
