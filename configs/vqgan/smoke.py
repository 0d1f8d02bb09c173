# Tiny synthetic smoke config (DRY_RUN-style pipeline rehearsal).
_base_ = [
    "../datasets/synthetic.py",
    "../strategies/dp.py",
]

_small_model = dict(
    type="AutoencoderModel",
    encoder=dict(
        type="VQGANEncoder",
        width=32,
        width_mults=(1, 2),
        depth_mult=1,
        out_channels=16,
    ),
    quantizer=dict(
        type="VectorQuantizer",
        codebook_size=64,
        embedding_dim=16,
        losses=dict(vqgan=dict(beta=0.25)),
    ),
    decoder=dict(
        type="VQGANDecoder",
        width=32,
        width_mults=(2, 1),
        depth_mult=1,
        in_channels=16,
        attention_layer=None,
        refine_layer=None,
    ),
)

_algorithm = dict(
    type="VQGANAlgorithm",
    model=_small_model,
    discriminator=dict(type="PatchGANDiscriminator", width=16, depth=2),
    optimizer=dict(type="adam", lr=1e-4, betas=(0.5, 0.9)),
    d_optimizer=dict(type="adam", lr=4e-4, betas=(0.5, 0.9)),
    recon_losses=dict(l1=dict(), mse=dict()),
)

trainer = dict(
    type="Trainer",
    max_iters=5,
    dataloader=dict(batch_size=8, shuffle=True),
    algorithm=_algorithm,
    dataset=dict(image_size=32, size=32),
    callbacks=[
        dict(type="LogCallback", interval=1),
        dict(type="CheckpointCallback", interval=5),
    ],
)
validator = dict(
    type="Validator",
    dataloader=dict(batch_size=8),
    algorithm=_algorithm,
    dataset=dict(image_size=32, size=16),
    metrics=dict(
        codebook_usage=dict(type="CodebookUsageMetric", codebook_size=64),
        psnr=dict(type="ImageLossMetric", kind="psnr"),
    ),
)
