# VQGAN 8192 with the StyleGAN2 discriminator
# (reference configs/vqgan/8192_stylegan2_imagenet_ddp.py).
_base_ = [
    "8192_imagenet_ddp.py",
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
