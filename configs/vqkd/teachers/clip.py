# CLIP-B/16 teacher with projection (reference configs/vqkd/teachers/clip.py).
runner = dict(
    algorithm=dict(
        teacher=dict(_delete_=True, type="CLIPTeacher", proj_dim=512),
        model=dict(decoder=dict(out_channels=512)),
    ),
)

_export_ = dict(trainer=runner, validator=runner)
