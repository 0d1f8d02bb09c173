# Scalar quantization (reference configs/sq/interface.py is an EMPTY
# placeholder — the sq algorithm only contributes the ScalarQuantizer base
# class that FSQ extends, vq/algorithms/sq/quantizers.py:11-13). Alias the
# FSQ recipe with the registered ScalarQuantizer.
import os as _os

_base_ = [
    Config.load(
        _os.path.join(_os.path.dirname(__file__), "../fsq/interface.py"),
        **_kwargs_,
    ),
]

runner = dict(
    algorithm=dict(model=dict(quantizer=dict(type="ScalarQuantizer"))),
)
trainer = runner
validator = runner
