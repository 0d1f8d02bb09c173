# Golden-harness synthetic config: the tiny taming-VQGAN layout that
# tools/record_published.py grafts a fixed-seed synthetic torch checkpoint
# onto (convert → graft → validate → record). Mirrors the layout of the
# torch checkpoint synthesizer (tests/test_parity_torch._TmVQGAN: width 32,
# mults (1, 2), enc_depth 2, dec_depth 3, zdim 8, 16 codes).
_base_ = [
    "../datasets/synthetic.py",
    "../strategies/dp.py",
]

_model = dict(
    type="AutoencoderModel",
    encoder=dict(
        type="VQGANEncoder",
        width=32,
        width_mults=(1, 2),
        depth_mult=2,
        out_channels=8,
    ),
    post_encode=dict(type="ConvConnector", out_channels=8),
    quantizer=dict(
        type="VectorQuantizer",
        codebook_size=16,
        embedding_dim=8,
        losses=dict(vqgan=dict(beta=0.25)),
    ),
    pre_decode=dict(type="ConvConnector", out_channels=8),
    decoder=dict(
        type="VQGANDecoder",
        width=32,
        width_mults=(2, 1),
        depth_mult=3,
        in_channels=8,
    ),
)

validator = dict(
    type="Validator",
    dataloader=dict(batch_size=8),
    dataset=dict(image_size=32, size=8),
    algorithm=dict(
        type="VQGANAlgorithm",
        model=_model,
        discriminator=dict(type="PatchGANDiscriminator", width=16, depth=2),
        optimizer=dict(type="adam", lr=1e-4),
        recon_losses=dict(l1=dict(), mse=dict()),
    ),
    metrics=dict(
        codebook_usage=dict(type="CodebookUsageMetric", codebook_size=16),
        codebook_ppl=dict(type="CodebookPPLMetric", codebook_size=16),
        l1=dict(type="ImageLossMetric", kind="l1"),
        mse=dict(type="ImageLossMetric", kind="mse"),
        psnr=dict(type="ImageLossMetric", kind="psnr"),
        ssim=dict(type="ImageLossMetric", kind="ssim"),
    ),
)
