# LlamaGen VQGAN ablation without attention/refine blocks (reference
# configs/exps/llamagen_vqgan_imagenet_ddp-no_refine_layer.py). -1 is the
# disable sentinel (None means "default placement" in our coders).
_base_ = [
    "../llamagen/vqgan_imagenet_ddp.py",
]

_coder = dict(attention_layer=-1, refine_layer=-1)
runner = dict(algorithm=dict(model=dict(encoder=_coder, decoder=_coder)))
trainer = runner
validator = runner
