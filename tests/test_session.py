"""Station/session-level tools: multi-over PTT loop, web tx front-end,
results dashboard (reference: ptt_test.sh, public_html/, README tables)."""

import json
import os
import threading
import urllib.request
import wave

import numpy as np
import pytest

FIX = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "fixtures")
CKPT = os.path.join(FIX, "model_fs_flagship.npz")
FEATS = os.path.join(FIX, "speech_feats.f32")


@pytest.fixture(scope="module")
def flagship_params():
    if not (os.path.exists(CKPT) and os.path.exists(FEATS)):
        pytest.skip("flagship fixture not present")
    from radae_tpu.convert import load_checkpoint
    params, _ = load_checkpoint(CKPT)
    return params


def test_ptt_loop_two_overs(flagship_params):
    """Two overs with a gap through AWGN at 3 dB: the single receiver
    instance acquires both, detects both EOOs, and drops sync in the gap
    (the console-station protocol, reference: ptt_test.sh)."""
    from radae_tpu.tools.ptt_loop import run_session, emit_session
    feats = np.fromfile(FEATS, np.float32).reshape(-1, 36)
    reports, session, marks = run_session(
        flagship_params, feats, n_overs=2, over_secs=4.0, gap_secs=2.0,
        snrdB=3.0, seed=1)
    # PTT keys exactly around each over's samples as the IQ is written
    edges = []
    emit_session(session, marks, os.devnull,
                 ptt_hook=lambda on: edges.append(on))
    assert edges == [True, False, True, False]
    assert len(marks) == 2 and marks[0][1] <= marks[1][0]
    for i, r in enumerate(reports):
        assert r["acquired"], (i, reports)
        assert r["eoo"], (i, reports)
        assert r["frames_decoded"] >= 20, (i, reports)
    # receiver returned to search between/after overs
    assert reports[0]["unsynced_after"] or reports[1]["unsynced_after"]


def test_webtx_roundtrip(flagship_params, tmp_path):
    """POST a wav to the web tx service; the returned IQ demodulates with
    the streaming receiver (public_html tx_form/tx_process analog)."""
    from http.server import ThreadingHTTPServer
    from radae_tpu.tools.webtx import make_handler, FORM
    from radae_tpu.apps.rxe import RadaeRx

    srv = ThreadingHTTPServer(("127.0.0.1", 0),
                              make_handler(flagship_params))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        url = f"http://127.0.0.1:{srv.server_port}"
        assert b"form" in urllib.request.urlopen(url).read()

        # 3 s of real speech (vocoder synthesis from the fixture features
        # — a synthetic test tone is out-of-distribution for the encoder
        # and garbles the auxdata UW, forcing unsyncs)
        from radae_tpu.vocoder import MelVocoder, SPEECH_FS
        feats = np.fromfile(FEATS, np.float32).reshape(-1, 36)[:300]
        pcm = MelVocoder().synthesize(feats).astype(np.int16)
        wav_path = tmp_path / "in.wav"
        with wave.open(str(wav_path), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(SPEECH_FS)
            w.writeframes(pcm.tobytes())
        req = urllib.request.Request(url + "/tx",
                                     data=wav_path.read_bytes(),
                                     method="POST")
        iq = np.frombuffer(urllib.request.urlopen(req).read(),
                           np.float32).view(np.complex64)
        assert len(iq) > 8000
    finally:
        srv.shutdown()

    rx = RadaeRx(params=flagship_params, auxdata=True, v=0)
    out = np.zeros(rx.get_n_floats_out(), np.float32)
    stream = np.concatenate([iq, np.zeros(16000, np.complex64)])
    got_valid = got_eoo = False
    ptr = 0
    while ptr + rx.get_nin() <= len(stream):
        nin = rx.get_nin()
        ret = rx.do_radae_rx(stream[ptr:ptr + nin], out)
        got_valid |= bool(ret & 1)
        got_eoo |= bool(ret & 2)
        ptr += nin
    assert got_valid and got_eoo


def test_report_dashboard(tmp_path):
    from radae_tpu.tools.report import main as report_main
    sweep = {"awgn@3.0": 0.31, "awgn@10.0": 0.22,
             "mpp@3.0": 0.45, "mpp@10.0": 0.27}
    sj = tmp_path / "sweep.json"
    sj.write_text(json.dumps(sweep))
    (tmp_path / "BENCH_r02.json").write_text(json.dumps(
        {"parsed": {"metric": "serving_throughput", "value": 1150000,
                    "unit": "audio-s/s/chip", "vs_baseline": 751634}}))
    out = tmp_path / "out.html"
    report_main([str(out), "--sweep", str(sj), "--bench", str(tmp_path)])
    page = out.read_text()
    assert "0.450" in page and "mpp" in page
    assert "serving_throughput" in page and "1,150,000" in page


def test_wav_to_wav_end_to_end(flagship_params, tmp_path):
    """The COMPLETE product path with both trained fixtures: wav ->
    vocoder analysis -> radae encoder -> OFDM rate-Fs channel @ 10 dB ->
    pilot-EQ receiver -> decoder -> trained neural vocoder synthesis ->
    wav.  Gate: cepstral MSE of the output wav's re-analysis vs the input
    features stays within budget (vocoder round trip ~0.54 + radae
    channel distortion; measured 0.69)."""
    import numpy as np
    from radae_tpu.vocoder import MelVocoder
    from radae_tpu.tools.wav_pipeline import main as wp_main, write_wav, \
        read_wav

    feats36 = np.fromfile(FEATS, np.float32).reshape(-1, 36)[:600]
    voc = MelVocoder()
    pcm_in = voc.synthesize(feats36)
    win, wout = str(tmp_path / "in.wav"), str(tmp_path / "out.wav")
    write_wav(win, pcm_in)
    wp_main([CKPT, win, wout, "--EbNodB", "10", "--auxdata",
             "--vocoder", "neural"])
    f2 = voc.extract(read_wav(wout))
    fin = voc.extract(pcm_in)
    n = min(len(f2), len(fin)) - 4
    best = np.inf
    for d in range(-3, 4):
        a = fin[max(0, -d): n - max(0, d), :18]
        b = f2[max(0, d): n - max(0, -d), :18]
        m = min(len(a), len(b))
        best = min(best, float(np.mean((a[:m] - b[:m]) ** 2)))
    assert best < 1.2, best


def test_ptt_loop_two_overs_mpp_fading(flagship_params):
    """Multi-over session through MPP fading at 3 dB: every over must
    acquire and decode; EOO detection may be swallowed by a fade on one
    over (physics), but not on all."""
    from radae_tpu.tools.ptt_loop import run_session
    feats = np.fromfile(FEATS, np.float32).reshape(-1, 36)
    reports, _, _ = run_session(flagship_params, feats, n_overs=2,
                                over_secs=5.0, gap_secs=2.0,
                                channel="mpp", snrdB=3.0, seed=1)
    for i, r in enumerate(reports):
        assert r["acquired"], (i, reports)
        assert r["frames_decoded"] >= 25, (i, reports)
    assert any(r["eoo"] for r in reports), reports
