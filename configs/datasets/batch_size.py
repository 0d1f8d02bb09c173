# Per-process batch sizes (reference configs/datasets/batch_size.py:
# (trainer, validator) batch_sizes / num_workers pairs).
batch_sizes = _kwargs_.get("batch_sizes", (16, 16))
num_workers = _kwargs_.get("num_workers", (8, 8))

_export_ = dict(
    trainer=dict(
        dataloader=dict(batch_size=batch_sizes[0], num_workers=num_workers[0]),
    ),
    validator=dict(
        dataloader=dict(batch_size=batch_sizes[1], num_workers=num_workers[1]),
    ),
)
