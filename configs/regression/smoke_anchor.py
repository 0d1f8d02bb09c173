# Cross-round regression anchor: smoke-scale VQGAN self-train on synthetic
# data with a fixed seed. tools/record_published.py trains this config,
# validates, and records the metric dict into BASELINE.json["published"]
# (the reference's recorded-metrics workflow,
# /root/reference/docs/pretrained_models.md:44-51, with self-trained
# provenance because upstream checkpoints are unreachable offline).
_base_ = [
    "../datasets/synthetic.py",
    "../strategies/dp.py",
]

_model = dict(
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
    model=_model,
    discriminator=dict(type="PatchGANDiscriminator", width=16, depth=2),
    optimizer=dict(type="adam", lr=1e-4, betas=(0.5, 0.9)),
    d_optimizer=dict(type="adam", lr=4e-4, betas=(0.5, 0.9)),
    recon_losses=dict(l1=dict(), mse=dict()),
)

trainer = dict(
    type="Trainer",
    max_iters=20,
    dataloader=dict(batch_size=8, shuffle=True),
    algorithm=_algorithm,
    dataset=dict(image_size=32, size=32),
    callbacks=[
        dict(type="LogCallback", interval=10),
        dict(type="CheckpointCallback", interval=20),
    ],
)
validator = dict(
    type="Validator",
    dataloader=dict(batch_size=8),
    algorithm=_algorithm,
    dataset=dict(image_size=32, size=16),
    metrics=dict(
        codebook_usage=dict(type="CodebookUsageMetric", codebook_size=64),
        codebook_ppl=dict(type="CodebookPPLMetric", codebook_size=64),
        l1=dict(type="ImageLossMetric", kind="l1"),
        mse=dict(type="ImageLossMetric", kind="mse"),
        psnr=dict(type="ImageLossMetric", kind="psnr"),
        ssim=dict(type="ImageLossMetric", kind="ssim"),
    ),
)
