"""Audio front-ends (reference: data_utils/wav2mel.py, HubertBean.py,
hubert.py, wav2vec.py)."""

from .mel import melspectrogram, wav_to_mel_chunks, MelParams
from .hubert import HubertFeatureExtractor, HubertStreamer
