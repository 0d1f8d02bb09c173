_base_ = [
    "interface.py",
    "../datasets/imagenet.py",
    "../strategies/dp.py",
]
