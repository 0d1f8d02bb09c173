# Pixel-decoder stage over the frozen VQ-KD CLIP tokenizer — turns the
# feature tokenizer into an image tokenizer (reference configs/decoder/vqkd.py
# + configs/decoder/README.md workflow).
_base_ = [
    "interface.py",
    "../datasets/imagenet.py",
    "../strategies/dp.py",
]

trainer = dict(dataset=dict(image_size=224))
validator = dict(dataset=dict(image_size=224))
