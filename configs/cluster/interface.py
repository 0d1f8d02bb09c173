# Cluster — training-free tokenizer (reference configs/cluster/model.py:16-36):
# frozen teacher as encoder, codebook learned by CodebookLoss + synced CVQ.
codebook_size = _kwargs_.get("codebook_size", 8192)
teacher = _kwargs_.get("teacher", dict(type="CLIPTeacher", proj_dim=None, final_norm=True))
teacher_dim = _kwargs_.get("teacher_dim", 768)
batch_size_in_total = _kwargs_.get("batch_size_in_total", 512)
max_iters = _kwargs_.get("max_iters", 50_000)

model = dict(
    type="TokenizerModel",
    encoder=dict(type="ClusterEncoder", teacher=teacher),
    quantizer=dict(
        type="VectorQuantizer",
        codebook_size=codebook_size,
        embedding_dim=teacher_dim,
        losses=dict(codebook=dict()),
    ),
)

algorithm = dict(
    type="ClusterAlgorithm",
    model=model,
    optimizer=dict(type="adam", lr=1e-4, exclude="encoder"),
    codebook_update=dict(
        type="cvq", ema_decay=0.99, anchor="nearest", sync=True
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
            codebook_ppl=dict(
                type="CodebookPPLMetric", codebook_size=codebook_size
            ),
        ),
    ),
)
