# LlamaGen VQGAN with the StyleGAN2 discriminator
# (reference configs/llamagen/vqgan_stylegan2_imagenet_ddp.py).
_base_ = [
    "vqgan_imagenet_ddp.py",
]

runner = dict(
    algorithm=dict(
        discriminator=dict(
            _delete_=True, type="StyleGAN2Discriminator", image_size=256
        ),
    ),
)
trainer = runner
validator = runner
