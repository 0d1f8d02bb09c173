# CVQ-VAE = the main VQGAN recipe + cosine distance + online clustered
# codebook reinit (reference configs/cvqvae/8192_dd2_aglwg075_imagenet_ddp.py).
_base_ = [
    "../vqgan/8192_dd2_aglwg075_imagenet_ddp.py",
    "quantizer.py",
]

runner = dict(algorithm=dict(model=dict(quantizer=dict(distance="cosine"))))
trainer = runner
validator = runner
