# DINO ViT-B/16 teacher (reference configs/vqkd/teachers/dino.py).
runner = dict(
    algorithm=dict(
        teacher=dict(_delete_=True, type="DINOTeacher"),
        model=dict(decoder=dict(out_channels=768)),
    ),
)

_export_ = dict(trainer=runner, validator=runner)
