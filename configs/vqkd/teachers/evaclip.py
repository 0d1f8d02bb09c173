# EVA02-CLIP-B/16 teacher, pre-projection features (reference
# configs/vqkd/teachers/evaclip.py: out_chans 768, /16, 224px input).
runner = dict(
    algorithm=dict(
        teacher=dict(
            _delete_=True,
            type="CLIPTeacher",
            proj_dim=None,
            image_size=224,
        ),
        model=dict(decoder=dict(out_channels=768)),
    ),
)

_export_ = dict(trainer=runner, validator=runner)
