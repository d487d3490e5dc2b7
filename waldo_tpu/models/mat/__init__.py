from .mat import Generator, SynthesisNet, FirstStage
from .inpainter import MatInpainter
