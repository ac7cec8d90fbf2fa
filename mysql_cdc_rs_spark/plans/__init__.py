"""Plan layer: end-to-end pipeline assembly + checkpoint-resume manifest."""
