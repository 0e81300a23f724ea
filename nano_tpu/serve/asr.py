"""Offline ASR server — the voice-input side of the appliance stack.

Counterpart of the reference's ASR feed (reference:
infer/asr/asr_server.py:1-124 — sherpa-onnx streaming paraformer +
punctuation — and the FIFO glue infer/asr.c:10-100): a push-to-talk
byte arrives on ``/tmp/ptt_fifo`` (1 = start listening, 0 = stop) and
recognized text is written to ``/tmp/asr_fifo`` for whatever frontend
is listening (the reference Pod; our WSS server can inject it as a
prompt).

Recognizer backends are pluggable:
  * sherpa-onnx streaming (the reference's choice) when the package and
    model files are available — this image has neither, so the import is
    gated;
  * any callable ``recognize(audio_capture_fn) -> str`` — the tests use
    a canned recognizer, and a custom backend (e.g. whisper.cpp over a
    socket) drops in the same way.

Run: python -m nano_tpu.serve.asr [--ptt-fifo P] [--asr-fifo P]
"""

from __future__ import annotations

import argparse
import errno
import os
import threading
import time
from typing import Callable, Optional

PTT_FIFO = "/tmp/ptt_fifo"
ASR_FIFO = "/tmp/asr_fifo"


def make_sherpa_recognizer(model_dir: str) -> Callable[[], str]:
    """sherpa-onnx streaming paraformer, as the reference configures it
    (asr_server.py:35-54).  Raises ImportError/FileNotFoundError when
    the package or model files are missing."""
    import sherpa_onnx  # noqa: F401  (gated: not in this image)

    def recognize() -> str:  # pragma: no cover - needs mic + models
        raise NotImplementedError(
            "wire sounddevice capture to sherpa_onnx.OnlineRecognizer "
            "as in the reference asr_server.py")
    return recognize


class AsrFifoServer:
    """PTT-gated recognizer loop speaking the reference FIFO protocol.

    One byte on the PTT fifo starts (1) or stops (0) a capture; on stop,
    ``recognizer()`` produces the text, which is written UTF-8 to the ASR
    fifo (reference: infer/asr.c set_ptt_status / get_asr_result).
    """

    def __init__(self, recognizer: Callable[[], str],
                 ptt_fifo: str = PTT_FIFO, asr_fifo: str = ASR_FIFO,
                 on_text: Optional[Callable[[str], None]] = None):
        self.recognizer = recognizer
        self.ptt_fifo = ptt_fifo
        self.asr_fifo = asr_fifo
        self.on_text = on_text
        self.listening = False
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None

    @staticmethod
    def _mkfifo(path: str) -> None:
        try:
            os.mkfifo(path, 0o666)
        except OSError as e:
            if e.errno != errno.EEXIST:
                raise

    def _emit(self, text: str) -> None:
        if self.on_text:
            self.on_text(text)
        # non-blocking write, dropped if no reader (like the C glue,
        # infer/asr.c:34-47)
        try:
            fd = os.open(self.asr_fifo, os.O_WRONLY | os.O_NONBLOCK)
        except OSError:
            return
        try:
            os.write(fd, text.encode("utf-8"))
        except OSError:
            pass
        finally:
            os.close(fd)

    def _loop(self) -> None:
        self._mkfifo(self.ptt_fifo)
        self._mkfifo(self.asr_fifo)
        # blocking read open; O_RDWR so the fd survives writer churn
        fd = os.open(self.ptt_fifo, os.O_RDWR)
        try:
            while not self._stop.is_set():
                try:
                    data = os.read(fd, 1)
                except OSError:
                    break
                if not data:
                    time.sleep(0.01)
                    continue
                if data[0] == 1:
                    self.listening = True
                elif data[0] == 0 and self.listening:
                    self.listening = False
                    try:
                        text = self.recognizer()
                    except Exception as e:  # recognizer failure is not fatal
                        text = ""
                        if self.on_text:
                            self.on_text(f"[asr error: {e}]")
                    if text:
                        self._emit(text)
                elif data[0] == 0xFF:      # test/shutdown poke
                    break
        finally:
            os.close(fd)

    def start(self) -> "AsrFifoServer":
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self._stop.set()
        # unblock the fifo read
        try:
            fd = os.open(self.ptt_fifo, os.O_WRONLY | os.O_NONBLOCK)
            os.write(fd, b"\xff")
            os.close(fd)
        except OSError:
            pass
        if self._thread:
            self._thread.join(timeout=5)


def main() -> None:  # pragma: no cover - needs sherpa + mic
    ap = argparse.ArgumentParser(description="Nano ASR FIFO server")
    ap.add_argument("--model-dir", default="",
                    help="sherpa-onnx streaming paraformer dir")
    ap.add_argument("--ptt-fifo", default=PTT_FIFO)
    ap.add_argument("--asr-fifo", default=ASR_FIFO)
    args = ap.parse_args()
    rec = make_sherpa_recognizer(args.model_dir)
    srv = AsrFifoServer(rec, args.ptt_fifo, args.asr_fifo).start()
    print(f"ASR server: ptt={args.ptt_fifo} asr={args.asr_fifo}")
    try:
        while True:
            time.sleep(1)
    except KeyboardInterrupt:
        srv.stop()


if __name__ == "__main__":
    main()
