from .decoder import Decoder, decode_annexb
