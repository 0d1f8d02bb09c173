from .base import QuantizerOutput
from .fsq import FiniteScalarQuantizer, ScalarQuantizer
from .vq import VectorQuantizer
