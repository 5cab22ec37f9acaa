from llamago_tpu.eval.perplexity import perplexity  # noqa: F401
