# Data-parallel strategy (reference configs/strategies/ddp.py). Alias of
# dp.py: batch-axis sharding over the mesh replaces DDP gradient all-reduce.
_base_ = ["dp.py"]
