"""Real-time serving stack (reference: webapi.py, HubertInferenceMQ.py,
GradioSession.py, mq_consume/ConsumeMQByWebRTC.py)."""

from .session import InferenceSession
from .streaming import (FrameSink, FfmpegRtmpSink, FfmpegMp4Sink, RawFileSink,
                        NullSink, make_sink)
