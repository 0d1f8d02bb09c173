from . import connectors, layers
from .autoencoders.vqgan import VQGANDecoder, VQGANEncoder
from .quantizers.base import QuantizerOutput
from .quantizers.fsq import FiniteScalarQuantizer
from .quantizers.vq import VectorQuantizer
