# Training-free Cluster tokenizer over CLIP features, 8192 codes
# (reference configs/cluster/clip_8192_imagenet_ddp.py).
_base_ = [
    "interface.py",
    "encoders/clip.py",
    "../datasets/imagenet.py",
    "../strategies/dp.py",
]

trainer = dict(dataset=dict(image_size=224))
validator = dict(dataset=dict(image_size=224))
