from .layers import ConvBlock, ResBlock, Norm, conv, conv3x3
from .sr_net import SuRSSR
from .hourglass import HourGlass, HGFilter
from .surface_classifier import SurfaceClassifier
from .surs_net import SuRSNet, surs_net_from_config

__all__ = [
    "ConvBlock", "ResBlock", "Norm", "conv", "conv3x3", "SuRSSR",
    "HourGlass", "HGFilter", "SurfaceClassifier", "SuRSNet",
    "surs_net_from_config",
]
