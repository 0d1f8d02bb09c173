# AR proposal network (reference configs/ar/ + configs/llamagen/ar.py:20-26):
# Llama-medium 24L/16H/1024d/2816ffn, batch 256, 250k iters, AdamW 1e-4,
# CFG dropout 0.1 / alpha 1.75, top-k 600 / top-p 0.92 sampling.
num_categories = _kwargs_.get("num_categories", 1000)
image_size = _kwargs_.get("image_size", 256)
batch_size_in_total = _kwargs_.get("batch_size_in_total", 256)
max_iters = _kwargs_.get("max_iters", 250_000)
lr = _kwargs_.get("lr", 1e-4)
cfg = _kwargs_.get("cfg", 0.1)
cfg_alpha = _kwargs_.get("cfg_alpha", 1.75)

# the frozen tokenizer bridging pixels<->codes (LlamaGen VQGAN by default);
# its weights load via `--load-model-from` composition or ir_checkpoint.
ir = _kwargs_.get(
    "ir",
    dict(
        type="AutoencoderModel",
        encoder=dict(type="VQGANEncoder", width=128, out_channels=8),
        quantizer=dict(
            type="VectorQuantizer",
            codebook_size=16384,
            embedding_dim=8,
            normalize_inputs=True,
        ),
        decoder=dict(type="VQGANDecoder", width=128, in_channels=8),
    ),
)

transformer = _kwargs_.get(
    "transformer",
    dict(
        type="LlamaTransformer",
        hidden_size=1024,
        num_layers=24,
        num_heads=16,
        ffn_dim=2816,
        # the measured single-chip training recipe (r5,
        # work_dirs/exp/exp_proc_r5.py): bf16 compute + per-block remat;
        # with the algorithm's fused CE the b64 step needs 5.6 GB and
        # b128 fits a 16 GB chip (work_dirs/exp/exp_mem_r5.py)
        dtype="bfloat16",
        remat=True,
    ),
)

algorithm = dict(
    type="ARAlgorithm",
    transformer=transformer,
    ir=ir,
    num_categories=num_categories,
    cfg=cfg,
    cfg_alpha=cfg_alpha,
    sampler=dict(temperature=1.0, top_k=600, top_p=0.92),
    image_size=image_size,
    optimizer=dict(
        type="adamw",
        lr=lr,
        weight_decay=0.05,
        grad_clip=1.0,
        schedule=dict(type="cosine", warmup=10_000, total=max_iters),
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
            dict(type="TensorBoardCallback", interval=50),
            dict(type="CheckpointCallback", interval=10_000),
        ],
    ),
    validator=dict(
        type="Validator",
        dataloader=dict(batch_size_in_total=batch_size_in_total),
        algorithm=algorithm,
        metrics=dict(
            loss=dict(type="LossMetric", key="loss"),
            accuracy=dict(type="AccuracyMetric"),
        ),
    ),
)
