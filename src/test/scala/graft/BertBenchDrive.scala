package graft

import java.nio.file.{Files, Path}

import graft.embedding.{BertEmbedder, Safetensors}
import graft.embedding.Safetensors.Tensor
import graft.util.Json

/** Single-executor BertEmbedder throughput probe (Test/runMain): a
  * MiniLM-shaped synthetic checkpoint (hidden 384, 6 layers, 12 heads,
  * FFN 1536 — the all-MiniLM-L6-v2 geometry the reference defaults to),
  * batch-32 embedding over ~25-token sentences, reported as tokens/s
  * and rows/s per executor thread. The number this prints is the one
  * BASELINE.md's local-inference paragraph records; cluster throughput
  * is this figure x executor cores, since inference is a pure
  * mapPartitions map with no shuffle. */
object BertBenchDrive {

  private def miniLmCheckpoint(): Path = {
    val dir = Files.createTempDirectory("graft-bert-bench")
    val H = 384; val Layers = 6; val Inter = 1536; val MaxPos = 512
    val base = Seq("the", "cat", "sat", "on", "mat", "dog", "runs", "fast",
      "spark", "query", "engine", "shuffle", "data", "big", "small", "index")
    val words = base ++ base.map("##" + _) ++
      (0 until 968).map(i => s"w$i")
    val vocabList = Seq("[PAD]", "[UNK]", "[CLS]", "[SEP]") ++ words
    val cfg = Map(
      "vocab_size" -> vocabList.size, "hidden_size" -> H,
      "num_hidden_layers" -> Layers, "num_attention_heads" -> 12,
      "intermediate_size" -> Inter, "max_position_embeddings" -> MaxPos,
      "type_vocab_size" -> 2, "layer_norm_eps" -> 1e-12, "hidden_act" -> "gelu")
    Files.writeString(dir.resolve("config.json"), Json.write(cfg))
    val vocab = vocabList.zipWithIndex.toMap
    val tok = Map(
      "normalizer" -> Map("type" -> "BertNormalizer", "lowercase" -> true),
      "model" -> Map("type" -> "WordPiece", "unk_token" -> "[UNK]",
        "continuing_subword_prefix" -> "##",
        "vocab" -> vocab.map { case (k, v) => k -> v.toLong }))
    Files.writeString(dir.resolve("tokenizer.json"), Json.write(tok))
    val rnd = new scala.util.Random(11)
    def t(scale: Double, shape: Int*): Tensor =
      Tensor(shape.toArray, Array.fill(shape.product)((rnd.nextGaussian() * scale).toFloat))
    def ones(n: Int) = Tensor(Array(n), Array.fill(n)(1f))
    def zeros(n: Int) = Tensor(Array(n), new Array[Float](n))
    val tensors = Seq.newBuilder[(String, Tensor)]
    tensors += ("embeddings.word_embeddings.weight" -> t(0.02, vocabList.size, H))
    tensors += ("embeddings.position_embeddings.weight" -> t(0.02, MaxPos, H))
    tensors += ("embeddings.token_type_embeddings.weight" -> t(0.02, 2, H))
    tensors += ("embeddings.LayerNorm.weight" -> ones(H))
    tensors += ("embeddings.LayerNorm.bias" -> zeros(H))
    (0 until Layers).foreach { i =>
      val p = s"encoder.layer.$i."
      Seq("attention.self.query", "attention.self.key", "attention.self.value",
        "attention.output.dense").foreach { nm =>
        tensors += (p + nm + ".weight" -> t(0.02, H, H))
        tensors += (p + nm + ".bias" -> zeros(H))
      }
      tensors += (p + "attention.output.LayerNorm.weight" -> ones(H))
      tensors += (p + "attention.output.LayerNorm.bias" -> zeros(H))
      tensors += (p + "intermediate.dense.weight" -> t(0.02, Inter, H))
      tensors += (p + "intermediate.dense.bias" -> zeros(Inter))
      tensors += (p + "output.dense.weight" -> t(0.02, H, Inter))
      tensors += (p + "output.dense.bias" -> zeros(H))
      tensors += (p + "output.LayerNorm.weight" -> ones(H))
      tensors += (p + "output.LayerNorm.bias" -> zeros(H))
    }
    Safetensors.write(dir.resolve("model.safetensors"), tensors.result())
    dir
  }

  def main(args: Array[String]): Unit = {
    val dir = miniLmCheckpoint()
    val embedder = new BertEmbedder(dir.toString, "bench-minilm")
    val rnd = new scala.util.Random(3)
    val wordsPool = Seq("the", "cat", "sat", "on", "mat", "dog", "runs", "fast",
      "spark", "query", "engine", "shuffle", "data", "big", "small", "index")
    def sentence(): String =
      (0 until 25).map(_ => wordsPool(rnd.nextInt(wordsPool.length))).mkString(" ")
    val batch = Vector.fill(32)(sentence())
    val tokensPerRow = 25 + 2 // + [CLS]/[SEP]
    // warm-up: weights load + JIT
    (1 to 3).foreach(_ => embedder.embed(batch))
    val nBatches = if (args.nonEmpty) args(0).toInt else 20
    val t0 = System.nanoTime()
    (1 to nBatches).foreach(_ => embedder.embed(batch))
    val sec = (System.nanoTime() - t0) / 1e9
    val rows = nBatches * batch.length
    val toks = rows.toLong * tokensPerRow
    println(f"BERT_BENCH rows=$rows sec=$sec%.2f rows_per_s=${rows / sec}%.1f " +
      f"tokens_per_s=${toks / sec}%.0f (MiniLM-L6 geometry, batch 32, seq ~27, 1 thread)")
  }
}
