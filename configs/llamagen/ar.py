# LlamaGen AR stage over the LlamaGen VQGAN tokenizer
# (reference configs/llamagen/ar.py).
_base_ = [
    "../ar/interface.py",
    "../datasets/imagenet.py",
    "../strategies/dp.py",
]
