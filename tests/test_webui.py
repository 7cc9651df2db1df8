"""Drive the stdlib web UI over real HTTP with tiny models."""

import threading
import urllib.parse
import urllib.request
from http.server import ThreadingHTTPServer

import numpy as np
import pytest

from tortoise_tts_tpu import webui
from tortoise_tts_tpu.config import Config, Inference
from tortoise_tts_tpu.inference import TTS

from tests.test_inference_e2e import tiny_models  # noqa: F401  (fixture)


@pytest.fixture()
def server(tiny_models, monkeypatch):  # noqa: F811
    cfg = Config(inference=Inference(weight_dtype="float32",
                                     text_buckets=(32, 80)))
    tts = TTS(config=cfg, dtype="float32")
    tts._models = dict(tiny_models)
    from tortoise_tts_tpu.emb import mel as emb_mel
    monkeypatch.setattr(emb_mel, "load_model",
                        lambda name, dtype="float32": tiny_models[name])
    srv = ThreadingHTTPServer(("127.0.0.1", 0), webui._make_handler(tts))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}"
    srv.shutdown()


def test_form_renders(server):
    html = urllib.request.urlopen(server + "/", timeout=30).read().decode()
    assert "tortoise-tts-tpu" in html
    assert 'name="text"' in html
    assert 'name="max_ar_steps"' in html


def test_generate_roundtrip(server):
    data = urllib.parse.urlencode({
        "text": "hello from the web ui",
        "references": "",
        "max_ar_steps": "12",
        "max_diffusion_steps": "2",
        "ar_temp": "0.8",
        "diffusion_temp": "1.0",
        "top_p": "1.0",
        "top_k": "0",
        "repetition_penalty": "1.0",
        "seed": "0",
        "diffusion_sampler": "ddim",
        "vocoder_type": "bigvgan",
        "cond_free": "false",
    }).encode()
    html = urllib.request.urlopen(server + "/generate", data=data,
                                  timeout=600).read().decode()
    assert "<audio" in html, html[-500:]
    # fetch the generated wav
    import re
    m = re.search(r'src="(/audio/[0-9a-f]+\.wav)"', html)
    assert m
    wav = urllib.request.urlopen(server + m.group(1), timeout=30).read()
    assert wav[:4] == b"RIFF" and len(wav) > 2000


def test_stream_endpoint_yields_wav(server):
    """/stream: chunked WAV streaming out of the UI (reference gradio
    streaming=True capability)."""
    url = server + "/stream?text=hi"
    with urllib.request.urlopen(url, timeout=600) as r:
        data = r.read()
    assert data[:4] == b"RIFF" and b"WAVE" in data[:16]
    assert len(data) > 44 + 1000   # contains real PCM
