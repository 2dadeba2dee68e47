"""Model zoo: the reference's workload models (SURVEY §2.8) as a library."""

from .cnn import CIFAR10_CNN, MLP, MNIST_CNN, DishesCNN
from .mobilenet import InvertedResidual, MobileNetV1, MobileNetV2, make_divisible
from .resnet import (
    BasicBlock,
    Bottleneck,
    ResidualBlock,
    ResNet,
    ResNet18,
    ResNet34,
    ResNet50,
)
from .llama import LlamaBlock, LlamaLM
from .transformer_lm import TransformerLM
from .vgg import VGG, VGG16
from .vit import EncoderBlock, ViT_Tiny, VisionTransformer

__all__ = [
    "VisionTransformer",
    "ViT_Tiny",
    "EncoderBlock",
    "TransformerLM",
    "LlamaLM",
    "LlamaBlock",
    "MLP",
    "MNIST_CNN",
    "CIFAR10_CNN",
    "DishesCNN",
    "ResNet",
    "ResNet18",
    "ResNet34",
    "ResNet50",
    "BasicBlock",
    "Bottleneck",
    "ResidualBlock",
    "MobileNetV1",
    "MobileNetV2",
    "InvertedResidual",
    "make_divisible",
    "VGG",
    "VGG16",
]
from .decoding import KVCacheDecoder
from .engine import InflightEngine, InflightHandle
from .mixtral import MixtralBlock, MixtralLM
from .seq2seq import CrossDecoderBlock, Seq2SeqGenerator, Seq2SeqTransformer
from .speculative import SpeculativeDecoder

__all__ += [
    "KVCacheDecoder",
    "InflightEngine",
    "InflightHandle",
    "SpeculativeDecoder",
    "MixtralLM",
    "MixtralBlock",
    "Seq2SeqTransformer",
    "Seq2SeqGenerator",
    "CrossDecoderBlock",
]
