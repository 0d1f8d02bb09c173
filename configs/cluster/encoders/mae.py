# Cluster encoder = frozen MAE ViT-B/16 features
# (reference configs/cluster/encoders/mae.py).
runner = dict(
    algorithm=dict(
        model=dict(
            encoder=dict(
                teacher=dict(_delete_=True, type="MAETeacher"),
            ),
            quantizer=dict(embedding_dim=768),
        ),
    ),
)

_export_ = dict(trainer=runner, validator=runner)
