#!/usr/bin/env bash
# Serving launcher (reference run.sh: starts the SRS media server container
# and the web API).
#
# Usage:
#   ./run.sh                      # API only, null sink (no media server)
#   LIVE=1 ./run.sh               # hls-fmp4 sink: live playback in the
#                                 # browser player (http://<host>:7860/)
#                                 # with NO media server — the bundled MSE
#                                 # client plays /hls/stream.m3u8 directly
#   RTMP_URL=rtmp://localhost/live/stream ./run.sh    # push to a local SRS
#                                 # (WebRTC/WHEP playback via SRS, as in
#                                 # the reference deployment)
#
# To run SRS (needs docker, as in the reference deployment):
#   docker run -d --name srs -p 1935:1935 -p 1985:1985 -p 8080:8080 \
#       ossrs/srs:5 ./objs/srs -c conf/rtmp2rtc.conf

set -euo pipefail
cd "$(dirname "$0")"

PORT="${PORT:-7860}"
DATA_ROOT="${DATA_ROOT:-data}"
TRIAL_ROOT="${TRIAL_ROOT:-.}"

if [[ -n "${RTMP_URL:-}" ]]; then
    exec python -m lzzx_nerf_tpu.serving.webapi --port "$PORT" \
        --data-root "$DATA_ROOT" --trial-root "$TRIAL_ROOT" \
        --sink rtmp --rtmp-url "$RTMP_URL"
elif [[ -n "${LIVE:-}" ]]; then
    exec python -m lzzx_nerf_tpu.serving.webapi --port "$PORT" \
        --data-root "$DATA_ROOT" --trial-root "$TRIAL_ROOT" \
        --sink hls-fmp4 --out "${HLS_OUT:-hls_out}"
else
    exec python -m lzzx_nerf_tpu.serving.webapi --port "$PORT" \
        --data-root "$DATA_ROOT" --trial-root "$TRIAL_ROOT" --sink null
fi
