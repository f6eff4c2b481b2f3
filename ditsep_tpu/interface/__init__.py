"""Demo interfaces (gradio-gated)."""
from ditsep_tpu.interface.gradio_ui import create_ui
