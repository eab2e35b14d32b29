from .codec import Codec
from . import bitstream
