# Codebook-size knob (reference configs/vq/num_embeddings.py).
num_embeddings = _kwargs_.get("num_embeddings", 8192)

runner = dict(
    algorithm=dict(model=dict(quantizer=dict(codebook_size=num_embeddings))),
)

_export_ = dict(trainer=runner, validator=runner)
