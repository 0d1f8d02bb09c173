_base_ = [
    "../datasets/imagenet.py",
    "../strategies/dp.py",
]

# load the interface with the 64000-code levels (8,8,8,5,5,5)
import os as _os

_iface = Config.load(  # noqa: F821 (injected by the loader)
    _os.path.join(_os.path.dirname(__file__), "interface.py"),
    levels=(8, 8, 8, 5, 5, 5),
)
trainer = _iface["trainer"]
validator = _iface["validator"]
