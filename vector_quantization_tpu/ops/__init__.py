from .codebook import (
    CodebookState,
    cached_anchors,
    code_frequency,
    code_histogram,
    cluster_stats,
    cvq_decay,
    cvq_update,
    ema,
    kmeans_init,
    kmeans_update,
    multinomial_anchors,
    nearest_anchors,
    random_anchors,
)
from .distances import cosine_distance, l2_distance_sq, normalize, pairwise_distance
from .fsq import FSQCodec
from .losses import (
    codebook_loss,
    commitment_loss,
    entropy_loss,
    vqgan_quantizer_loss,
)
from .ste import ste
from .vq_lookup import nearest_codes, nearest_codes_xla, vq_quantize
