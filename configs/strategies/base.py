# Single-device strategy (reference configs/strategies/base.py).
_base_ = ["single.py"]
