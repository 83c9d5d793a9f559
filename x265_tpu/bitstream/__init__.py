from .bitwriter import BitWriter
from .bitreader import BitReader
from .nal import NalUnitType, wrap_nal, annexb_stream, split_annexb
from .cabac import CabacEncoder, CabacDecoder, init_context, ContextSet
