"""The registry tree.

Mirrors the reference's root tree (``vq/registries.py:9-34``:
``VQRegistry → VQ{Dataset,Model,Runner,Task}Registry``) plus the model
sub-registries (``vq/models/registries.py:8-21``,
``vq/tasks/image_tokenization/models/registries.py``,
``vq/runners/registries.py:8-16``), flattened into one module so every
component file can import its registry without circular imports.
"""

from .utils.registry import Registry

VQRegistry = Registry("VQ")

DatasetRegistry = VQRegistry.child("datasets")
ModelRegistry = VQRegistry.child("models")
RunnerRegistry = VQRegistry.child("runners")
TaskRegistry = VQRegistry.child("tasks")
AlgorithmRegistry = VQRegistry.child("algorithms")

# model sub-registries (reference: VQEncoderRegistry / VQDecoderRegistry /
# VQLossRegistry / VQQuantizerRegistry / VQConnectorRegistry / ...)
EncoderRegistry = ModelRegistry.child("encoders")
DecoderRegistry = ModelRegistry.child("decoders")
QuantizerRegistry = ModelRegistry.child("quantizers")
ConnectorRegistry = ModelRegistry.child("connectors")
LossRegistry = ModelRegistry.child("losses")
DiscriminatorRegistry = ModelRegistry.child("discriminators")
TransformerRegistry = ModelRegistry.child("transformers")
SamplerRegistry = ModelRegistry.child("samplers")
TeacherRegistry = ModelRegistry.child("teachers")
DistanceRegistry = ModelRegistry.child("distances")
UpdateRegistry = ModelRegistry.child("updates")

# runner sub-registries
CallbackRegistry = RunnerRegistry.child("callbacks")
MetricRegistry = RunnerRegistry.child("metrics")
OptimizerRegistry = RunnerRegistry.child("optimizers")
StrategyRegistry = RunnerRegistry.child("strategies")
