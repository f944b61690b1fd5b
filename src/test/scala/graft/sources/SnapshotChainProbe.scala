package graft.sources

/** Test-only window into manifest internals for cross-package specs:
  * the delta-chain length of each version (readRaw is package-private). */
object SnapshotChainProbe {
  def maxChain(root: String, versions: Seq[Int]): Int =
    versions.map(v => SnapshotTable.readRaw(root, v).chain).max
}
