# Cluster encoder = frozen CLIP-B/16 features without projection
# (reference configs/cluster/encoders/clip.py).
runner = dict(
    algorithm=dict(
        model=dict(
            encoder=dict(
                teacher=dict(
                    _delete_=True,
                    type="CLIPTeacher",
                    proj_dim=None,
                    final_norm=True,
                ),
            ),
            quantizer=dict(embedding_dim=768),
        ),
    ),
)

_export_ = dict(trainer=runner, validator=runner)
