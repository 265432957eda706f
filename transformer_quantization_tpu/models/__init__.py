from transformer_quantization_tpu.models.bert import (
    BertConfig,
    init_bert_params,
    bert_apply,
    declare_bert_sites,
    apply_bert_quant_dict,
    apply_peg_wiring,
    bert_weight_site_tensors,
)
