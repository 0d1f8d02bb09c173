# CVQ-VAE online clustered-codebook callback (reference
# configs/cvqvae/quantizer.py: CVQVAECallback with EMA + NearestAnchor).
runner = dict(
    algorithm=dict(
        codebook_update=dict(
            type="cvq", ema_decay=0.99, anchor="nearest", sync=True
        ),
    ),
)

_export_ = dict(trainer=runner, validator=runner)
