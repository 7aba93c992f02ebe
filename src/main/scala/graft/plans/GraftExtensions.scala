package graft.plans

import org.apache.spark.sql.SparkSessionExtensions

/** Engine extension entry point, registered via
  * `spark.sql.extensions=graft.plans.GraftExtensions` (pinned in
  * [[graft.GraftSession]]). Custom Catalyst rules live here — added
  * only where built-in optimizer behavior genuinely lacks the
  * reference's semantics (SURVEY.md §4.1); everything else rides the
  * stock optimizer. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(StatsAnsweredAggregates.apply)
    // SQL-callable row-pattern PTF: SELECT * FROM matchpath(...)
    ext.injectTableFunction((MatchPathTvf.identifier, MatchPathTvf.info,
      MatchPathTvf.build))
    // SQL-callable as-of join: SELECT * FROM asof_join(...)
    ext.injectTableFunction((AsofTvf.identifier, AsofTvf.info,
      AsofTvf.build))
    // SQL-callable retrieval: SELECT * FROM bm25_topk(...) /
    // hybrid_topk(...) — the s12/s13 plans behind a SQL prompt
    ext.injectTableFunction((Bm25TopkTvf.identifier, Bm25TopkTvf.info,
      Bm25TopkTvf.build))
    ext.injectTableFunction((HybridTopkTvf.identifier, HybridTopkTvf.info,
      HybridTopkTvf.build))
    ext.injectTableFunction((KnnTopkTvf.identifier, KnnTopkTvf.info,
      KnnTopkTvf.build))
    // SQL-callable dedup: SELECT * FROM neardup_pairs(...) /
    // dedup_clusters(...) — the d03/d06b plans behind a SQL prompt
    ext.injectTableFunction((NeardupPairsTvf.identifier,
      NeardupPairsTvf.info, NeardupPairsTvf.build))
    ext.injectTableFunction((DedupClustersTvf.identifier,
      DedupClustersTvf.info, DedupClustersTvf.build))
    // SQL-callable STORED-index serving: bm25_serve(dir) /
    // knn_serve(dir, view) — the build-once/serve-many half of the
    // index lifecycle behind the same prompt
    ext.injectTableFunction((Bm25ServeTvf.identifier, Bm25ServeTvf.info,
      Bm25ServeTvf.build))
    ext.injectTableFunction((KnnServeTvf.identifier, KnnServeTvf.info,
      KnnServeTvf.build))
    ext.injectTableFunction((HybridServeTvf.identifier,
      HybridServeTvf.info, HybridServeTvf.build))
    // SQL-callable table fsck: SELECT * FROM table_fsck('<chain dir>')
    // — dq08's manifest audit against any chain, for the operator
    // mid-incident
    ext.injectTableFunction((TableFsckTvf.identifier, TableFsckTvf.info,
      TableFsckTvf.build))
    // SQL-callable INDEX fsck: index_fsck('<index dir>', '<corpus
    // view>') — dq06/dq07's stored-index audits against any w12/w07
    // layout (the dir's structure selects the check set)
    ext.injectTableFunction((IndexFsckTvf.identifier, IndexFsckTvf.info,
      IndexFsckTvf.build))
    // Memo-invalidation verb: graft_refresh('<view>') — drops the
    // plan-build memos (counts, clusterings) for the named view
    ext.injectTableFunction((GraftRefreshTvf.identifier,
      GraftRefreshTvf.info, GraftRefreshTvf.build))
  }
}
