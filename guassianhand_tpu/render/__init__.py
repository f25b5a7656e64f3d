from guassianhand_tpu.render.renderer import GSRenderer, RendererConfig, EditConfig
