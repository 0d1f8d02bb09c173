# CVQ-VAE (reference configs/cvqvae/): VQGAN backbone + online clustered
# codebook reinitialisation (quantizer.py:1-6: EMA decay 0.99, anchors).
codebook_size = _kwargs_.get("codebook_size", 8192)
embedding_dim = _kwargs_.get("embedding_dim", 256)
batch_size_in_total = _kwargs_.get("batch_size_in_total", 96)
max_iters = _kwargs_.get("max_iters", 260_000)
anchor = _kwargs_.get("anchor", "nearest")  # nearest|multinomial|random|cached
sync = _kwargs_.get("sync", True)

model = dict(
    type="AutoencoderModel",
    encoder=dict(type="VQGANEncoder", width=128, out_channels=embedding_dim),
    quantizer=dict(
        type="VectorQuantizer",
        codebook_size=codebook_size,
        embedding_dim=embedding_dim,
        losses=dict(vqgan=dict(beta=0.25)),
    ),
    decoder=dict(type="VQGANDecoder", width=128, in_channels=embedding_dim),
)

algorithm = dict(
    type="ReconstructionAlgorithm",
    model=model,
    optimizer=dict(type="adam", lr=1e-4),
    recon_losses=dict(l1=dict(), mse=dict()),
    codebook_update=dict(
        type="cvq", ema_decay=0.99, anchor=anchor, sync=sync
    ),
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
            codebook_usage=dict(
                type="CodebookUsageMetric", codebook_size=codebook_size
            ),
            psnr=dict(type="ImageLossMetric", kind="psnr"),
        ),
    ),
)
