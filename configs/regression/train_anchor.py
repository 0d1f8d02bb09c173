# Long fixed-seed regression anchor (VERDICT r3 #8): 2k-iter VQGAN
# self-train that reaches non-trivial reconstruction (PSNR >= 15 on the
# procedural sinusoid corpus), so the cross-round drift gate has signal
# beyond 20-iter noise. Recorded by tools/record_published.py alongside
# the smoke anchor (reference recorded-metrics workflow,
# /root/reference/docs/pretrained_models.md:44-51).
_base_ = [
    "../datasets/synthetic.py",
    "../strategies/dp.py",
]

_model = dict(
    type="AutoencoderModel",
    encoder=dict(
        type="VQGANEncoder",
        width=48,
        width_mults=(1, 2),
        depth_mult=1,
        out_channels=32,
    ),
    quantizer=dict(
        type="VectorQuantizer",
        codebook_size=256,
        embedding_dim=32,
        losses=dict(vqgan=dict(beta=0.25)),
    ),
    decoder=dict(
        type="VQGANDecoder",
        width=48,
        width_mults=(2, 1),
        depth_mult=1,
        in_channels=32,
        attention_layer=None,
        refine_layer=None,
    ),
)

_algorithm = dict(
    type="VQGANAlgorithm",
    model=_model,
    discriminator=dict(type="PatchGANDiscriminator", width=16, depth=2),
    # discriminator enters late so the anchor measures a stable recon fit
    discriminator_start=1500,
    optimizer=dict(type="adam", lr=2e-4, betas=(0.5, 0.9)),
    d_optimizer=dict(type="adam", lr=4e-4, betas=(0.5, 0.9)),
    recon_losses=dict(l1=dict(), mse=dict()),
)

trainer = dict(
    type="Trainer",
    max_iters=2000,
    dataloader=dict(batch_size=16, shuffle=True),
    algorithm=_algorithm,
    dataset=dict(image_size=32, size=128),
    callbacks=[
        dict(type="LogCallback", interval=500),
        dict(type="CheckpointCallback", interval=2000),
    ],
)
validator = dict(
    type="Validator",
    dataloader=dict(batch_size=16),
    algorithm=_algorithm,
    dataset=dict(image_size=32, size=32),
    metrics=dict(
        codebook_usage=dict(type="CodebookUsageMetric", codebook_size=256),
        codebook_ppl=dict(type="CodebookPPLMetric", codebook_size=256),
        l1=dict(type="ImageLossMetric", kind="l1"),
        mse=dict(type="ImageLossMetric", kind="mse"),
        psnr=dict(type="ImageLossMetric", kind="psnr"),
        ssim=dict(type="ImageLossMetric", kind="ssim"),
    ),
)
