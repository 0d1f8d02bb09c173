# Llama-medium decoder: 24L/16H/1024d/2816ffn
# (reference configs/ar/transformers/llama.py:8-15).
size = _kwargs_.get("size", "medium")
_SIZES = dict(
    small=dict(hidden_size=768, num_layers=12, num_heads=12, ffn_dim=2048),
    medium=dict(hidden_size=1024, num_layers=24, num_heads=16, ffn_dim=2816),
    large=dict(hidden_size=1280, num_layers=36, num_heads=20, ffn_dim=3584),
)

runner = dict(
    algorithm=dict(
        transformer=dict(
            _delete_=True,
            type="LlamaTransformer",
            dtype="bfloat16",
            remat=True,
            **_SIZES[size],
        ),
    ),
)

_export_ = dict(trainer=runner, validator=runner)
