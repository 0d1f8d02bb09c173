# VQGAN interface (reference configs/vqgan/interface.py + runner.py):
# parameterized by codebook_size, embedding_dim, image_size, batch, iters.
# Recipe: global batch 96, 260k iters, Adam g-lr 5.4e-5 / d-lr 4.32e-4
# (betas .5/.9), adaptive g-loss weight gain 0.75 variant via aglw_gain.
codebook_size = _kwargs_.get("codebook_size", 8192)
embedding_dim = _kwargs_.get("embedding_dim", 256)
image_size = _kwargs_.get("image_size", 256)
batch_size_in_total = _kwargs_.get("batch_size_in_total", 96)
max_iters = _kwargs_.get("max_iters", 260_000)
g_lr = _kwargs_.get("g_lr", 5.4e-5)
d_lr = _kwargs_.get("d_lr", 4.32e-4)
aglw_gain = _kwargs_.get("aglw_gain", 0.8)
discriminator_start = _kwargs_.get("discriminator_start", 0)
normalize_codebook = _kwargs_.get("normalize_codebook", False)
width = _kwargs_.get("width", 128)

model = dict(
    type="AutoencoderModel",
    encoder=dict(type="VQGANEncoder", width=width, out_channels=embedding_dim),
    quantizer=dict(
        type="VectorQuantizer",
        codebook_size=codebook_size,
        embedding_dim=embedding_dim,
        normalize_inputs=normalize_codebook,
        losses=dict(vqgan=dict(beta=0.25)),
    ),
    decoder=dict(type="VQGANDecoder", width=width, in_channels=embedding_dim),
)

algorithm = dict(
    type="VQGANAlgorithm",
    model=model,
    discriminator=dict(type="PatchGANDiscriminator"),
    optimizer=dict(type="adam", lr=g_lr, betas=(0.5, 0.9)),
    d_optimizer=dict(type="adam", lr=d_lr, betas=(0.5, 0.9)),
    recon_losses=dict(l1=dict(), lpips=dict(weight=1.0)),
    aglw_gain=aglw_gain,
    discriminator_start=discriminator_start,
)
if normalize_codebook:
    algorithm["codebook_update"] = dict(type="normalize")

_export_ = dict(
    trainer=dict(
        type="Trainer",
        max_iters=max_iters,
        dataloader=dict(
            batch_size_in_total=batch_size_in_total, shuffle=True
        ),
        algorithm=algorithm,
        callbacks=[
            dict(type="LogCallback", interval=50),
            dict(type="TensorBoardCallback", interval=50),
            dict(type="CheckpointCallback", interval=10_000),
            dict(type="GitCallback"),
        ],
    ),
    validator=dict(
        type="Validator",
        dataloader=dict(batch_size_in_total=batch_size_in_total),
        algorithm=algorithm,
        metrics=dict(
            codebook_usage=dict(
                type="CodebookUsageMetric", codebook_size=codebook_size
            ),
            codebook_ppl=dict(
                type="CodebookPPLMetric", codebook_size=codebook_size
            ),
            l1=dict(type="ImageLossMetric", kind="l1"),
            mse=dict(type="ImageLossMetric", kind="mse"),
            psnr=dict(type="ImageLossMetric", kind="psnr"),
            ssim=dict(type="ImageLossMetric", kind="ssim"),
            fid=dict(type="FIDMetric"),
        ),
    ),
)
