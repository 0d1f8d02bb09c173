from .image_reconstruction import AutoencoderModel
from .image_tokenization import TokenizerModel
