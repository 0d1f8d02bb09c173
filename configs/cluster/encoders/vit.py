# Cluster encoder = frozen supervised ViT-B/16 features
# (reference configs/cluster/encoders/vit.py).
runner = dict(
    algorithm=dict(
        model=dict(
            encoder=dict(
                teacher=dict(_delete_=True, type="ViTTeacher"),
            ),
            quantizer=dict(embedding_dim=768),
        ),
    ),
)

_export_ = dict(trainer=runner, validator=runner)
