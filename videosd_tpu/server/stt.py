"""Speech-to-text session — the reference's STT track, implemented working.

The reference buffers audio into an AudioFifo while recording, writes a
WAV to /tmp and POSTs it to a whisper sidecar at
``http://whisper:9000/asr`` (diffusert/server.py:42-79) — but its stop
handler never actually runs (dead ``yield from`` in a callback,
server.py:207; SURVEY.md §3.6 "designed-but-broken").  This implementation
performs the intended flow end-to-end, with the whisper URL configurable
and a graceful error path when the sidecar is absent.
"""

from __future__ import annotations

import io
import os

import numpy as np

__all__ = ["STTSession"]


class STTSession:
    def __init__(self, whisper_url: str | None = None):
        self.whisper_url = whisper_url or os.environ.get(
            "WHISPER_URL", "http://whisper:9000/asr"
        )
        self.recording = False
        self._chunks: list[np.ndarray] = []
        self._sample_rate = 48000

    def start(self):
        self._chunks = []
        self.recording = True

    def add_frame(self, samples: np.ndarray, *, sample_rate: int = 48000):
        """samples: [channels, n] or [n] int16/float."""
        if not self.recording:
            return
        arr = np.asarray(samples)
        if arr.ndim == 2:
            arr = arr.mean(axis=0)
        self._chunks.append(arr)
        self._sample_rate = sample_rate

    def _render_wav(self) -> bytes:
        from scipy.io import wavfile

        if self._chunks:
            audio = np.concatenate(self._chunks)
        else:
            audio = np.zeros(1, np.int16)
        if audio.dtype != np.int16:
            audio = np.clip(audio, -1.0, 1.0)
            audio = (audio * 32767).astype(np.int16)
        buf = io.BytesIO()
        wavfile.write(buf, self._sample_rate, audio)
        return buf.getvalue()

    async def stop_and_transcribe(self) -> str:
        """Stop recording, POST WAV to whisper, return the transcript
        (reference fetch(), server.py:63-71: task=transcribe, json out)."""
        self.recording = False
        wav = self._render_wav()
        try:
            from aiohttp import ClientSession, ClientTimeout, FormData

            form = FormData()
            form.add_field(
                "audio_file", wav, filename="prompt.wav", content_type="audio/wav"
            )
            url = f"{self.whisper_url}?task=transcribe&language=en&output=json"
            async with ClientSession(timeout=ClientTimeout(total=60)) as session:
                async with session.post(url, data=form) as response:
                    payload = await response.json(content_type=None)
                    return payload.get("text", "")
        except Exception as exc:  # sidecar missing/unreachable
            return f"[stt unavailable: {type(exc).__name__}]"
