# GPT-2 decoder (reference configs/ar/transformers/gpt2.py: HF gpt2-medium
# 24L/16H/1024d; weights importable via tools/convert_weights.py).
size = _kwargs_.get("size", "medium")
_SIZES = dict(
    small=dict(hidden_size=768, num_layers=12, num_heads=12),
    medium=dict(hidden_size=1024, num_layers=24, num_heads=16),
    large=dict(hidden_size=1280, num_layers=36, num_heads=20),
)

runner = dict(
    algorithm=dict(
        transformer=dict(
            _delete_=True, type="GPT2Transformer", **_SIZES[size]
        ),
    ),
)

_export_ = dict(trainer=runner, validator=runner)
