"""WebRTC wiring contract test with stub aiortc/av (VERDICT round-2 #7).

aiortc is not installable in this image (the loopback test
tests/test_webrtc_loopback.py self-skips), so this module injects minimal
stub ``aiortc``/``av`` modules and drives the REAL
``videosd_tpu/server/webrtc.py`` logic end-to-end: handle_offer ->
on_track -> recv (submit/mailbox/passthrough semantics) -> data-channel
option mutation -> record start/stop transcription -> connection-state
cleanup.  The codecs/ICE are the stubs'; every line of our wiring is real.

Reference behaviors being pinned: diffusert/server.py:145-264 (offer,
channels, tracks), :119-143 (recv decoupling), :199-209 (record channel —
whose stop handler is dead code in the reference; ours must actually run).
"""

from __future__ import annotations

import asyncio
import json
import sys
import types

import numpy as np
import pytest


class _FakeVideoFrame:
    def __init__(self, arr, fmt):
        self._arr = arr
        self._fmt = fmt
        if fmt == "rgb24":
            self.height, self.width = arr.shape[:2]
        else:  # yuv420p packed: [h*3/2, w]
            self.height, self.width = arr.shape[0] * 2 // 3, arr.shape[1]
        self.pts = None
        self.time_base = None

    @classmethod
    def from_ndarray(cls, arr, format):
        return cls(arr, format)

    def to_ndarray(self, format):
        if format == self._fmt:
            return self._arr
        if format == "rgb24" and self._fmt == "yuv420p":
            raise AssertionError("test frames are rgb24")
        if format == "yuv420p" and self._fmt == "rgb24":
            h, w = self._arr.shape[:2]
            return np.zeros((h * 3 // 2, w), np.uint8)
        raise AssertionError(format)


class _FakeDataChannel:
    def __init__(self, label):
        self.label = label
        self.sent: list = []
        self._handlers = {}

    def on(self, event):
        def deco(fn):
            self._handlers[event] = fn
            return fn

        return deco

    def send(self, msg):
        self.sent.append(msg)

    def message(self, msg):
        self._handlers["message"](msg)


class _FakeCameraTrack:
    kind = "video"

    def __init__(self, frames):
        self._frames = list(frames)
        self._i = 0

    async def recv(self):
        # endless camera: repeat the last frame
        f = self._frames[min(self._i, len(self._frames) - 1)]
        self._i += 1
        fr = _FakeVideoFrame(f, "rgb24")
        fr.pts = 3000 * self._i
        fr.time_base = "1/90000"
        return fr


class _FakeAudioTrack:
    kind = "audio"

    def __init__(self):
        self.n = 0

    async def recv(self):
        self.n += 1
        frame = types.SimpleNamespace(
            to_ndarray=lambda: np.zeros((1, 960), np.int16),
            sample_rate=48000,
        )
        return frame


class _FakePC:
    instances: list = []

    def __init__(self, configuration=None):
        self.configuration = configuration
        self._handlers = {}
        self.added_tracks = []
        self.closed = False
        self.connectionState = "new"
        self.localDescription = None
        _FakePC.instances.append(self)

    def on(self, event):
        def deco(fn):
            self._handlers[event] = fn
            return fn

        return deco

    def addTrack(self, track):
        self.added_tracks.append(track)

    async def setRemoteDescription(self, desc):
        self.remoteDescription = desc

    async def createAnswer(self):
        return types.SimpleNamespace(sdp="answer-sdp", type="answer")

    async def setLocalDescription(self, desc):
        self.localDescription = desc

    async def close(self):
        self.closed = True

    # -- test drivers --
    def fire_track(self, track):
        self._handlers["track"](track)

    def fire_datachannel(self, ch):
        self._handlers["datachannel"](ch)

    async def fire_state(self, state):
        self.connectionState = state
        await self._handlers["connectionstatechange"]()


class FakeEngine:
    """Engine contract double: open/submit/update/close + black frame."""

    input_format = "rgb24"

    def __init__(self):
        self.submitted = []
        self.updates = []
        self.closed_streams = []
        self._sid = 0

    def open_stream(self, options):
        self._sid += 1
        opts = {"height": 64, "width": 64}
        opts.update(options or {})
        return types.SimpleNamespace(stream_id=f"s{self._sid}", options=opts)

    def _black_output(self, h, w):
        return np.zeros((h, w, 3), np.uint8)

    async def submit_frame(self, stream_id, arr):
        self.submitted.append((stream_id, np.asarray(arr).shape))
        await asyncio.sleep(0)
        return np.full((64, 64, 3), 200, np.uint8)

    def update_options(self, stream_id, msg):
        self.updates.append((stream_id, dict(msg)))

    def close_stream(self, stream_id):
        self.closed_streams.append(stream_id)


@pytest.fixture()
def webrtc_mod(monkeypatch):
    """Import videosd_tpu.server.webrtc against stub aiortc/av modules."""
    if "aiortc" in sys.modules and not hasattr(sys.modules["aiortc"], "_stub"):
        pytest.skip("real aiortc present; the loopback test covers this")

    aiortc = types.ModuleType("aiortc")
    aiortc._stub = True
    aiortc.RTCConfiguration = lambda iceServers=None: types.SimpleNamespace(
        iceServers=iceServers
    )
    aiortc.RTCIceServer = lambda urls, username=None, credential=None: (
        types.SimpleNamespace(urls=urls, username=username, credential=credential)
    )
    aiortc.RTCPeerConnection = _FakePC
    aiortc.RTCSessionDescription = lambda sdp, type: types.SimpleNamespace(
        sdp=sdp, type=type
    )
    contrib = types.ModuleType("aiortc.contrib")
    media = types.ModuleType("aiortc.contrib.media")

    class _Blackhole:
        def __init__(self):
            self.tracks = []
            self.stopped = False

        def addTrack(self, t):
            self.tracks.append(t)

        async def stop(self):
            self.stopped = True

    media.MediaBlackhole = _Blackhole
    streams = types.ModuleType("aiortc.mediastreams")

    class _MST:
        def __init__(self):
            pass

    streams.MediaStreamTrack = _MST
    av = types.ModuleType("av")
    av.VideoFrame = _FakeVideoFrame

    saved = {
        k: sys.modules.get(k)
        for k in (
            "aiortc",
            "aiortc.contrib",
            "aiortc.contrib.media",
            "aiortc.mediastreams",
            "av",
            "videosd_tpu.server.webrtc",
        )
    }
    sys.modules["aiortc"] = aiortc
    sys.modules["aiortc.contrib"] = contrib
    sys.modules["aiortc.contrib.media"] = media
    sys.modules["aiortc.mediastreams"] = streams
    sys.modules["av"] = av
    sys.modules.pop("videosd_tpu.server.webrtc", None)
    _FakePC.instances.clear()
    import videosd_tpu.server.webrtc as mod

    yield mod
    for k, v in saved.items():
        if v is None:
            sys.modules.pop(k, None)
        else:
            sys.modules[k] = v


def _mk_app(engine):
    cfg = types.SimpleNamespace(turn_url=None)
    return {
        "engine": engine,
        "config": cfg,
        "sessions": set(),
        "pc_closers": [],
    }


def test_offer_track_recv_and_datachannel_wiring(webrtc_mod, monkeypatch):
    engine = FakeEngine()
    app = _mk_app(engine)

    async def run():
        ans = await webrtc_mod.handle_offer(
            app, {"sdp": "offer-sdp", "type": "offer", "options": {"strength": 0.5}}
        )
        assert ans == {"sdp": "answer-sdp", "type": "answer"}
        pc = _FakePC.instances[-1]
        assert pc in app["sessions"]

        # video track arrives -> VideoSDTrack is added as the OUTPUT track
        cam = _FakeCameraTrack([np.zeros((64, 64, 3), np.uint8)])
        pc.fire_track(cam)
        assert len(pc.added_tracks) == 1
        vtrack = pc.added_tracks[0]
        assert vtrack.stream.options["strength"] == 0.5

        # first recv: passthrough black init frame stamped with the INPUT
        # frame's pts (reference decoupling, server.py:140-143)
        out1 = await vtrack.recv()
        assert out1.pts == 3000
        assert np.asarray(out1._arr).max() == 0
        # let the submit task complete, then the next recv returns it
        for _ in range(5):
            await asyncio.sleep(0)
        out2 = await vtrack.recv()
        assert out2.pts == 6000
        assert np.asarray(out2._arr).max() == 200
        assert engine.submitted and engine.submitted[0][0] == vtrack.stream.stream_id
        assert engine.submitted[0][1] == (64, 64, 3)

        # prompt data channel mutates the stream's options live
        ch = _FakeDataChannel("prompt")
        pc.fire_datachannel(ch)
        ch.message(json.dumps({"strength": 0.9, "prompt": "a fox"}))
        assert engine.updates == [
            (vtrack.stream.stream_id, {"strength": 0.9, "prompt": "a fox"})
        ]

        # connection failure -> stream closed, pc closed, session discarded
        await pc.fire_state("failed")
        assert engine.closed_streams == [vtrack.stream.stream_id]
        assert pc.closed and pc not in app["sessions"]
        assert app["pc_closers"] == []

    asyncio.run(run())


def test_record_channel_runs_transcription(webrtc_mod, monkeypatch):
    """The reference's stop handler is a never-driven generator
    (server.py:207); ours must actually transcribe and reply."""
    from videosd_tpu.server.stt import STTSession

    engine = FakeEngine()
    app = _mk_app(engine)

    async def fake_stop(self):
        return "hello world"

    monkeypatch.setattr(STTSession, "stop_and_transcribe", fake_stop)

    async def run():
        await webrtc_mod.handle_offer(app, {"sdp": "o", "type": "offer"})
        pc = _FakePC.instances[-1]

        # audio track tees into the STT session while recording
        audio = _FakeAudioTrack()
        pc.fire_track(audio)
        atrack = None
        # AudioTeeTrack goes to the blackhole, not pc.addTrack
        assert pc.added_tracks == []

        ch = _FakeDataChannel("record")
        pc.fire_datachannel(ch)
        ch.message("start")
        ch.message("stop")
        await asyncio.sleep(0)
        await asyncio.sleep(0)
        assert ch.sent == ["hello world"]

    asyncio.run(run())


def test_i420_engine_gets_planar_frames(webrtc_mod):
    engine = FakeEngine()
    engine.input_format = "i420"
    app = _mk_app(engine)

    async def run():
        await webrtc_mod.handle_offer(app, {"sdp": "o", "type": "offer"})
        pc = _FakePC.instances[-1]
        cam = _FakeCameraTrack([np.zeros((64, 64, 3), np.uint8)])
        pc.fire_track(cam)
        vtrack = pc.added_tracks[0]
        await vtrack.recv()
        await asyncio.sleep(0)
        # packed planar upload: [h*3/2, w]
        assert engine.submitted[0][1] == (96, 64)

    asyncio.run(run())
