# Pixel-decoder training stage (reference configs/decoder/): train a
# VQGAN-style pixel decoder on top of a FROZEN VQ-KD tokenizer
# (encoder+quantizer excluded from the optimizer), with the usual GAN recipe.
codebook_size = _kwargs_.get("codebook_size", 8192)
embedding_dim = _kwargs_.get("embedding_dim", 32)
image_size = _kwargs_.get("image_size", 224)
batch_size_in_total = _kwargs_.get("batch_size_in_total", 96)
max_iters = _kwargs_.get("max_iters", 200_000)
# frozen-tokenizer knobs (decoder/vqgan.py trains over a VQGAN tokenizer
# instead of the VQ-KD ViT default)
encoder = _kwargs_.get(
    "encoder",
    dict(
        type="ViTEncoder",
        img_size=image_size,
        patch_size=16,
        out_channels=embedding_dim,
    ),
)
distance = _kwargs_.get("distance", "cosine")
normalize_inputs = _kwargs_.get("normalize_inputs", True)

model = dict(
    type="AutoencoderModel",
    encoder=encoder,
    quantizer=dict(
        type="VectorQuantizer",
        codebook_size=codebook_size,
        embedding_dim=embedding_dim,
        distance=distance,
        normalize_inputs=normalize_inputs,
        codebook_init="normal",
    ),
    pre_decode=dict(type="ConvConnector", out_channels=256),
    decoder=dict(
        type="VQGANDecoder",
        width=128,
        # 14x14 grid -> 224px: f16 upsampling
        in_channels=256,
    ),
)

algorithm = dict(
    type="VQGANAlgorithm",
    model=model,
    discriminator=dict(type="PatchGANDiscriminator"),
    # freeze the tokenizer: only decoder (+connector) and discriminator train
    optimizer=dict(
        type="adam",
        lr=1e-4,
        betas=(0.5, 0.9),
        exclude=["encoder", "quantizer/codebook"],
    ),
    d_optimizer=dict(type="adam", lr=1e-4, betas=(0.5, 0.9)),
    recon_losses=dict(l1=dict(), lpips=dict(weight=1.0)),
    discriminator_start=0,
)

_export_ = dict(
    trainer=dict(
        type="Trainer",
        max_iters=max_iters,
        dataloader=dict(batch_size_in_total=batch_size_in_total, shuffle=True),
        algorithm=algorithm,
        callbacks=[
            dict(type="LogCallback", interval=50),
            dict(type="CheckpointCallback", interval=10_000),
        ],
    ),
    validator=dict(
        type="Validator",
        dataloader=dict(batch_size_in_total=batch_size_in_total),
        algorithm=algorithm,
        metrics=dict(
            psnr=dict(type="ImageLossMetric", kind="psnr"),
            ssim=dict(type="ImageLossMetric", kind="ssim"),
            fid=dict(type="FIDMetric"),
        ),
    ),
)
