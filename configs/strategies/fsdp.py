# ZeRO-style parameter sharding (reference configs/strategies/fsdp.py).
fsdp = _kwargs_.get("fsdp", 2)

_export_ = dict(
    trainer=dict(
        mesh={"dp": -1, "fsdp": fsdp}, strategy=dict(type="FSDPStrategy")
    ),
    validator=dict(
        mesh={"dp": -1, "fsdp": fsdp}, strategy=dict(type="FSDPStrategy")
    ),
)
