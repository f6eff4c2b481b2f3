"""Demo interfaces: testable backends (app) + gradio-gated UI shell."""
from ditsep_tpu.interface.app import (
    AutoencoderApp,
    GenerationApp,
    LMApp,
    SeparationApp,
    spectrogram_preview,
)
from ditsep_tpu.interface.gradio_ui import create_ui
from ditsep_tpu.interface.web import DemoServer
