# Image-classification linear probe (reference configs/ic/: frozen tokenizer
# encode_to_quant → quantizer.decode → mean-pool → BN+Linear, LARS optimizer;
# vq/tasks/image_classification/models.py:28-122, optimizers.py:14-63).
num_categories = _kwargs_.get("num_categories", 1000)
image_size = _kwargs_.get("image_size", 256)
batch_size_in_total = _kwargs_.get("batch_size_in_total", 512)
max_iters = _kwargs_.get("max_iters", 90_000)

# the frozen tokenizer whose features are probed; weights come from
# --load-model-from composition (reference it_config/it_state_dict kwargs).
ir = _kwargs_.get(
    "ir",
    dict(
        type="AutoencoderModel",
        encoder=dict(type="VQGANEncoder", width=128, out_channels=256),
        quantizer=dict(
            type="VectorQuantizer", codebook_size=8192, embedding_dim=256
        ),
        decoder=dict(type="VQGANDecoder", width=128, in_channels=256),
    ),
)

algorithm = dict(
    type="ClassificationAlgorithm",
    ir=ir,
    num_categories=num_categories,
    image_size=image_size,
    optimizer=dict(type="lars", lr=0.1),
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
            accuracy=dict(type="AccuracyMetric"),
        ),
    ),
)
