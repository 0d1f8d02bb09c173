from .fid import FIDStatistics, frechet_distance, inception_score
from .inception import InceptionV3Features
