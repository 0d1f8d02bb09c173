# Supervised torchvision ViT-B/16 teacher (reference
# configs/vqkd/teachers/vit.py).
runner = dict(
    algorithm=dict(
        teacher=dict(_delete_=True, type="ViTTeacher"),
        model=dict(decoder=dict(out_channels=768)),
    ),
)

_export_ = dict(trainer=runner, validator=runner)
