# Data parallelism over all devices (reference configs/strategies/ddp.py).
_export_ = dict(
    trainer=dict(mesh={"dp": -1}, strategy=dict(type="DataParallelStrategy")),
    validator=dict(mesh={"dp": -1}, strategy=dict(type="DataParallelStrategy")),
)
