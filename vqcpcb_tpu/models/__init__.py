"""Model components: data processors, downscalers, upscalers, encoder
composition, CPC auxiliaries, teacher/auxiliary decoders, seq2seq decoder and
the code prior."""
