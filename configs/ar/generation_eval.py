# AR validation with full generation: FID over generated images + visual
# dumps (reference X2I validation, x2i.py:79-126 + configs/ar/runner.py).
_base_ = ["interface.py"]

validator = dict(
    algorithm=dict(eval_generate=True),
    metrics=dict(
        fid=dict(type="FIDMetric", pred="generated_image"),
        accuracy=dict(type="AccuracyMetric"),
    ),
    visual=dict(keys=["generated_image"], mode="batched"),
)
