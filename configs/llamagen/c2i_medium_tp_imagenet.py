# LlamaGen AR recipe (CFG alpha=1.75) with tensor-parallel weights.
_base_ = ["ar.py", "../strategies/tp.py"]
