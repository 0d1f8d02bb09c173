# FSQ tokenizer (reference configs/fsq/): codebook-free; levels
# [8,8,5,5,5] = 8000 codes or [8,8,8,5,5,5] = 64000
# (configs/fsq/model.py:15-18). VQGAN conv backbone, L1+MSE recon.
levels = tuple(_kwargs_.get("levels", (8, 8, 5, 5, 5)))
image_size = _kwargs_.get("image_size", 256)
batch_size_in_total = _kwargs_.get("batch_size_in_total", 96)
max_iters = _kwargs_.get("max_iters", 260_000)
lr = _kwargs_.get("lr", 1e-4)
width = _kwargs_.get("width", 128)

model = dict(
    type="AutoencoderModel",
    encoder=dict(type="VQGANEncoder", width=width, out_channels=256),
    post_encode=dict(type="ConvConnector"),  # width inferred from levels
    quantizer=dict(type="FiniteScalarQuantizer", levels=levels),
    pre_decode=dict(type="ConvConnector", out_channels=256),
    decoder=dict(type="VQGANDecoder", width=width, in_channels=256),
)

algorithm = dict(
    type="ReconstructionAlgorithm",
    model=model,
    optimizer=dict(type="adam", lr=lr),
    recon_losses=dict(l1=dict(), mse=dict()),
)

import numpy as _np

_codebook_size = int(_np.prod(levels))

_export_ = dict(
    trainer=dict(
        type="Trainer",
        max_iters=max_iters,
        dataloader=dict(batch_size_in_total=batch_size_in_total, shuffle=True),
        algorithm=algorithm,
        callbacks=[
            dict(type="LogCallback", interval=50),
            dict(type="TensorBoardCallback", interval=50),
            dict(type="CheckpointCallback", interval=10_000),
        ],
    ),
    validator=dict(
        type="Validator",
        dataloader=dict(batch_size_in_total=batch_size_in_total),
        algorithm=algorithm,
        metrics=dict(
            codebook_usage=dict(
                type="CodebookUsageMetric", codebook_size=_codebook_size
            ),
            codebook_ppl=dict(
                type="CodebookPPLMetric", codebook_size=_codebook_size
            ),
            psnr=dict(type="ImageLossMetric", kind="psnr"),
            ssim=dict(type="ImageLossMetric", kind="ssim"),
        ),
    ),
)
