from zkstark_tpu.transcript import bincode
from zkstark_tpu.transcript.channel import Channel, ReplayChannel, TranscriptError

__all__ = ["Channel", "ReplayChannel", "TranscriptError", "bincode"]
