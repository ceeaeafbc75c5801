"""Acoustic-phonetic tests for the offline speech synthesizer (io/speech.py).

The reference ships the three instructions as spoken audio
(testing/tts/using_tts.py:10-13). No ASR model exists on this box, so
intelligibility is asserted through the acoustic cues that carry the words:
duration, energy envelope (two words separated by a silent gap), the /r/ vs
/l/ third-formant contrast, the AY diphthong's F2 rise, fricative noise in
/f/, and final stop closure+burst timing. Determinism is also pinned (same
bits every call) since the WAVs are shipped assets.
"""

from __future__ import annotations

import pathlib
import wave

import numpy as np
import pytest

pytest.importorskip("scipy")

from vision_assist_tpu.io.speech import SAMPLE_RATE, synthesize  # noqa: E402

REPO = pathlib.Path(__file__).resolve().parents[1]


def _rms_track(a: np.ndarray, win_s: float = 0.02) -> np.ndarray:
    n = int(win_s * SAMPLE_RATE)
    k = len(a) // n
    return np.sqrt((a[: k * n].reshape(k, n) ** 2).mean(axis=1))


def _band_energy(a: np.ndarray, t0: float, t1: float,
                 f0: float, f1: float) -> float:
    seg = a[int(t0 * SAMPLE_RATE): int(t1 * SAMPLE_RATE)]
    spec = np.abs(np.fft.rfft(seg * np.hanning(len(seg)))) ** 2
    freqs = np.fft.rfftfreq(len(seg), 1.0 / SAMPLE_RATE)
    return float(spec[(freqs >= f0) & (freqs < f1)].sum())


PHRASES = ["move left", "move right", "continue forward"]


class TestSpeechSynthesis:
    def test_duration_and_level(self):
        for text in PHRASES:
            a, sr = synthesize(text)
            assert sr == SAMPLE_RATE
            dur = len(a) / sr
            assert 0.6 < dur < 2.0, f"{text}: {dur:.2f}s"
            assert 0.5 < np.abs(a).max() <= 1.0
            assert np.sqrt((a ** 2).mean()) > 0.05  # not near-silence

    def test_energy_envelope_two_words_with_gap(self):
        """Each phrase is two words: the envelope must show two sustained
        high-energy regions separated by a near-silent inter-word gap."""
        for text in PHRASES:
            a, _ = synthesize(text)
            env = _rms_track(a)
            thresh = 0.2 * env.max()
            active = env > thresh
            # runs of consecutive active windows
            edges = np.flatnonzero(np.diff(active.astype(int)))
            runs = np.split(np.arange(len(active)), edges + 1)
            word_runs = [r for r in runs if active[r[0]] and len(r) >= 4]
            assert len(word_runs) >= 2, f"{text}: no inter-word gap found"
            # the gap between the two longest regions is genuinely quiet
            gap_lo = word_runs[0][-1] + 1
            gap_hi = word_runs[1][0]
            if gap_hi > gap_lo:
                assert env[gap_lo:gap_hi].min() < 0.1 * env.max()

    def test_r_l_third_formant_contrast(self):
        """/r/ concentrates energy near its lowered F3 (~1.4 kHz); /l/ keeps
        F3 high (~2.8 kHz). Measured during the liquid onset of word 2."""
        left, _ = synthesize("move left")
        right, _ = synthesize("move right")
        # word 2 begins after pad (0.04) + "move" (~0.32) + gap (0.10)
        t0, t1 = 0.47, 0.53
        ratio_l = (_band_energy(left, t0, t1, 1200, 1600)
                   / max(_band_energy(left, t0, t1, 2600, 3000), 1e-12))
        ratio_r = (_band_energy(right, t0, t1, 1200, 1600)
                   / max(_band_energy(right, t0, t1, 2600, 3000), 1e-12))
        assert ratio_r > 50 * ratio_l, (ratio_l, ratio_r)

    def test_diphthong_f2_rise_in_right(self):
        """'right' carries AY: F2 starts low (~1.1 kHz) and rises toward
        2 kHz — the vowel's identity cue."""
        a, _ = synthesize("move right")
        early_lo = _band_energy(a, 0.55, 0.61, 900, 1300)
        early_hi = _band_energy(a, 0.55, 0.61, 1600, 2100)
        late_lo = _band_energy(a, 0.63, 0.69, 900, 1300)
        late_hi = _band_energy(a, 0.63, 0.69, 1600, 2100)
        assert early_lo > early_hi, "diphthong onset should sit low"
        assert late_hi > late_lo, "F2 did not rise across the diphthong"

    def test_fricative_noise_in_f(self):
        """/f/ in 'left'/'forward' is aperiodic high-band noise: the >3 kHz
        share of energy during the fricative beats any vowel's."""
        a, _ = synthesize("move left")

        def hi_share(t0, t1):
            hi = _band_energy(a, t0, t1, 3000, 8000)
            total = _band_energy(a, t0, t1, 50, 8000)
            return hi / max(total, 1e-12)

        vowel_share = hi_share(0.15, 0.25)     # UW in "move"
        fric_share = hi_share(0.70, 0.77)      # F in "left"
        assert fric_share > 5 * vowel_share, (vowel_share, fric_share)

    def test_final_stop_closure_then_burst(self):
        """'left'/'right' end in /t/: a near-silent closure followed by a
        short burst — the envelope must dip then spike near the end."""
        for text in ["move left", "move right"]:
            a, _ = synthesize(text)
            env = _rms_track(a, win_s=0.01)
            active = env > 0.1 * env.max()
            edges = np.flatnonzero(np.diff(active.astype(int)))
            runs = np.split(np.arange(len(active)), edges + 1)
            on = [r for r in runs if active[r[0]]]
            assert len(on) >= 2, f"{text}: no separate burst region"
            burst = on[-1]
            assert len(burst) <= 8, f"{text}: final region too long for a burst"
            gap = burst[0] - on[-2][-1] - 1
            assert gap >= 2, f"{text}: closure shorter than 20 ms"

    def test_deterministic(self):
        a1, _ = synthesize("continue forward")
        a2, _ = synthesize("continue forward")
        np.testing.assert_array_equal(a1, a2)

    def test_unknown_word_rejected(self):
        with pytest.raises(KeyError):
            synthesize("move backward")


class TestShippedAssets:
    """The committed WAVs (assets/audio/) are the product artifacts the
    reference ships; pin that they exist, are speech-length, and match the
    synthesizer's current output."""

    @pytest.mark.parametrize("name", ["move_left", "move_right",
                                      "continue_forward"])
    def test_asset_matches_synthesizer(self, name):
        path = REPO / "assets" / "audio" / f"{name}.wav"
        assert path.exists(), "run python -m vision_assist_tpu.io.speech"
        with wave.open(str(path)) as w:
            assert w.getframerate() == SAMPLE_RATE
            assert w.getnchannels() == 1
            pcm = np.frombuffer(w.readframes(w.getnframes()), np.int16)
        audio, _ = synthesize(name.replace("_", " "))
        expect = np.clip(audio * 32767, -32768, 32767).astype(np.int16)
        # Same length/rate, near-identical samples. NOT bit-exact (ADVICE
        # r4): scipy/numpy version drift (lfilter accumulation order,
        # window generation, rounding) can flip low bits; a dependency
        # bump must not read as a product regression. 2 LSB on int16 is
        # -84 dBFS — inaudible and far below any synthesis change.
        assert pcm.shape == expect.shape
        max_diff = np.abs(pcm.astype(np.int32) - expect.astype(np.int32)).max()
        assert max_diff <= 2, f"{name}: shipped WAV drifted {max_diff} LSB"
