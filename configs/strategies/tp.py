# Tensor parallelism for the AR transformer over the tp mesh axis, data
# parallelism over dp (north star; no reference analogue - SURVEY §2.10).
tp = _kwargs_.get("tp", 2)

_export_ = dict(
    trainer=dict(
        mesh={"dp": -1, "tp": tp}, strategy=dict(type="TPStrategy")
    ),
    validator=dict(
        mesh={"dp": -1, "tp": tp}, strategy=dict(type="TPStrategy")
    ),
)
