from .base import QuantizerOutput
from .fsq import FiniteScalarQuantizer
from .vq import VectorQuantizer
