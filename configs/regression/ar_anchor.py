# Stage-2 AR fixed-seed regression anchor (VERDICT r4 #7): a tiny C2I
# Llama teacher-forced for 800 iters on tokens from a FROZEN random
# tokenizer over the procedural sinusoid corpus. Teacher-forced CE +
# token accuracy gate training drift; tools/record_published.py adds a
# greedy-decode token-stream hash gating decode drift (scan decode, KV
# cache, sampler) — the stage-2 analogue of the stage-1 anchors
# (reference recorded-metrics workflow,
# /root/reference/docs/pretrained_models.md:44-51).
_base_ = [
    "../datasets/synthetic.py",
    "../strategies/dp.py",
]

# frozen random tokenizer: never trained, fixed-seed init — its codes are
# a deterministic function of the images, so the corpus is reproducible
_ir = dict(
    type="AutoencoderModel",
    encoder=dict(
        type="VQGANEncoder",
        width=16,
        width_mults=(1, 2, 2),  # downsample 4: 32px -> 8x8 codes, seq 65
        depth_mult=1,
        out_channels=8,
    ),
    quantizer=dict(
        type="VectorQuantizer",
        codebook_size=64,
        embedding_dim=8,
        normalize_inputs=True,
    ),
    decoder=dict(
        type="VQGANDecoder",
        width=16,
        width_mults=(2, 2, 1),
        depth_mult=1,
        in_channels=8,
        attention_layer=None,
        refine_layer=None,
    ),
)

_algorithm = dict(
    type="ARAlgorithm",
    transformer=dict(
        type="LlamaTransformer",
        hidden_size=128,
        num_layers=2,
        num_heads=4,
        ffn_dim=256,
    ),
    ir=_ir,
    num_categories=10,
    cfg=0.1,
    cfg_alpha=1.75,
    sampler=dict(temperature=1.0, top_k=8, top_p=0.92),
    image_size=32,
    optimizer=dict(type="adamw", lr=1e-3, weight_decay=0.05, grad_clip=1.0),
)

trainer = dict(
    type="Trainer",
    max_iters=800,
    dataloader=dict(batch_size=16, shuffle=True),
    algorithm=_algorithm,
    dataset=dict(image_size=32, size=128),
    callbacks=[
        dict(type="LogCallback", interval=200),
        dict(type="CheckpointCallback", interval=800),
    ],
)

validator = dict(
    type="Validator",
    dataloader=dict(batch_size=16),
    algorithm=_algorithm,
    dataset=dict(image_size=32, size=32),
    metrics=dict(
        loss=dict(type="LossMetric", key="loss"),
        accuracy=dict(type="AccuracyMetric"),
    ),
)
