# Single device (reference configs/strategies/base.py / cuda.py).
_export_ = dict(
    trainer=dict(mesh={"dp": 1}, strategy=dict(type="SingleDeviceStrategy")),
    validator=dict(mesh={"dp": 1}, strategy=dict(type="SingleDeviceStrategy")),
)
