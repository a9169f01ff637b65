"""TPU compute ops: scan-based LSTM, deformable convolution."""
