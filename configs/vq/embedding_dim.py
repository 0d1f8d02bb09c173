# Embedding-dim knob (reference configs/vq/embedding_dim.py). Also threads
# the width into the encoder/decoder projections, which the reference infers
# via connector build_pre_hooks.
embedding_dim = _kwargs_.get("embedding_dim", 256)

runner = dict(
    algorithm=dict(
        model=dict(
            encoder=dict(out_channels=embedding_dim),
            quantizer=dict(embedding_dim=embedding_dim),
            decoder=dict(in_channels=embedding_dim),
        ),
    ),
)

_export_ = dict(trainer=runner, validator=runner)
