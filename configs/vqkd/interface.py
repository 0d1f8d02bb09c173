# VQ-KD tokenizer (reference configs/vqkd/): BEiT ViT encoder/decoder,
# frozen teacher distillation, EMA k-means codebook.
# Recipe: 224px, batch 512, 250k iters, AdamW 2e-4 cosine + 25k warmup
# (configs/vqkd/interface.py:8-10, runner.py:7-83).
codebook_size = _kwargs_.get("codebook_size", 8192)
embedding_dim = _kwargs_.get("embedding_dim", 32)
image_size = _kwargs_.get("image_size", 224)
batch_size_in_total = _kwargs_.get("batch_size_in_total", 512)
max_iters = _kwargs_.get("max_iters", 250_000)
lr = _kwargs_.get("lr", 2e-4)
teacher = _kwargs_.get(
    "teacher", dict(type="CLIPTeacher", proj_dim=512)
)
teacher_dim = _kwargs_.get("teacher_dim", 512)

model = dict(
    type="AutoencoderModel",
    encoder=dict(
        type="ViTEncoder",
        img_size=image_size,
        patch_size=16,
        out_channels=embedding_dim,
    ),
    quantizer=dict(
        type="VectorQuantizer",
        codebook_size=codebook_size,
        embedding_dim=embedding_dim,
        distance="cosine",
        normalize_inputs=True,
        codebook_init="normal",
        losses=dict(commitment=dict(weight=1.0)),
    ),
    pre_decode=dict(type="ConvConnector", out_channels=embedding_dim),
    decoder=dict(
        type="ViTDecoder",
        img_size=image_size // 16,
        patch_size=1,
        in_channels=embedding_dim,
        out_channels=teacher_dim,
        depth=3,
    ),
)

algorithm = dict(
    type="VQKDAlgorithm",
    model=model,
    teacher=teacher,
    optimizer=dict(
        type="adamw",
        lr=lr,
        weight_decay=1e-4,
        schedule=dict(type="cosine", warmup=25_000, total=max_iters),
        exclude="codebook",
    ),
    recon_losses=dict(cosine=dict()),
    codebook_update=dict(type="kmeans", decay=0.99),
    lazy_kmeans_init=dict(iters=10),
)

_export_ = dict(
    trainer=dict(
        type="Trainer",
        max_iters=max_iters,
        dataloader=dict(batch_size_in_total=batch_size_in_total, shuffle=True),
        algorithm=algorithm,
        callbacks=[
            dict(type="LogCallback", interval=50),
            dict(type="TensorBoardCallback", interval=50),
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
            codebook_ppl=dict(
                type="CodebookPPLMetric", codebook_size=codebook_size
            ),
            r_loss=dict(type="LossMetric", key="loss_cosine"),
        ),
    ),
)
