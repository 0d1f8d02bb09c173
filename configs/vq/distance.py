# Distance-metric knob: 'l2' | 'cosine' (reference configs/vq/distance.py,
# vq/algorithms/vq/distances.py:29-46).
distance = _kwargs_.get("distance", "l2").lower()

runner = dict(algorithm=dict(model=dict(quantizer=dict(distance=distance))))

_export_ = dict(trainer=runner, validator=runner)
