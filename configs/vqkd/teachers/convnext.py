# ConvNeXt-B teacher (reference configs/vqkd/teachers/convnext.py). The /32
# feature map is bicubic-resized to the 14x14 code grid (output_size).
runner = dict(
    algorithm=dict(
        teacher=dict(
            _delete_=True, type="ConvNeXtTeacher", output_size=14
        ),
        model=dict(decoder=dict(out_channels=1024)),
    ),
)

_export_ = dict(trainer=runner, validator=runner)
