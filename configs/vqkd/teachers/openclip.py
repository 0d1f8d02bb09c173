# OpenCLIP teacher base (reference configs/vqkd/teachers/openclip.py).
# _kwargs_: embed_dim/depth/num_heads/proj_dim per model size. Patch-14
# towers emit a 16x16 grid at 224px; output_size=14 aligns it to the code
# grid (reference downsample_factor=14 + resize).
embed_dim = _kwargs_.get("embed_dim", 1024)
depth = _kwargs_.get("depth", 24)
num_heads = _kwargs_.get("num_heads", 16)
proj_dim = _kwargs_.get("proj_dim", 768)

runner = dict(
    algorithm=dict(
        teacher=dict(
            _delete_=True,
            type="CLIPTeacher",
            patch_size=14,
            embed_dim=embed_dim,
            depth=depth,
            num_heads=num_heads,
            proj_dim=proj_dim,
            image_size=224,
            output_size=14,
        ),
        model=dict(decoder=dict(out_channels=proj_dim)),
    ),
)

_export_ = dict(trainer=runner, validator=runner)
