"""CLI tools: cli (llama-cli), perplexity, quantize, bench analogs."""
