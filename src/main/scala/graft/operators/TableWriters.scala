package graft.operators

import org.apache.spark.sql.DataFrame

/** The reference's nine typed upsert writers (SURVEY S8;
  * `src/utils/lib.ts:96-279`: saveDevelopers ... saveCategoryAppPositions)
  * reduced to data: one conflict spec per table driving the single
  * generic [[WritePath.upsert]]. The reference hand-writes 184 lines of
  * per-table column lists + ON CONFLICT clauses; here each row is
  * (conflict keys, update columns) and the merge plan is shared.
  */
object TableWriters {

  /** table -> (conflict keys, columns updated on conflict).
    * Empty updateCols = insert-ignore (ON CONFLICT DO NOTHING, S7 —
    * reference `lib.ts:90-91`).
    */
  val specs: Map[String, (Seq[String], Seq[String])] = Map(
    // lib.ts:96-104
    "Developer" -> (Seq("handle"),
      Seq("name", "address", "email", "countryCode", "updatedAt")),
    // lib.ts:106-114 (self-FK hierarchy via parentHandle)
    "Category" -> (Seq("handle"), Seq("name", "level", "parentHandle", "updatedAt")),
    // lib.ts:116-124
    "CategoryFeature" -> (Seq("handle"), Seq("name", "updatedAt")),
    // lib.ts:126-134
    "CategoryFeatureGroup" -> (Seq("handle"), Seq("name", "updatedAt")),
    // lib.ts:136-145
    "App" -> (Seq("handle"), Seq("developerHandle", "launchDate", "updatedAt")),
    // lib.ts:147-225 (composite PK handle+capturedAt, lib.ts:220)
    "AppSnapshot" -> (Seq("handle", "capturedAt"),
      Seq("name", "tagline", "pricingText", "reviewCount", "rating",
        "isBuiltForShopify", "logoUrl", "demoStoreUrl", "introduction",
        "description", "metaTitle", "metaDescription", "plans", "media",
        "languages", "articlesFeaturedIn", "integrations", "features")),
    // lib.ts:227-243 (PK is all four columns -> insert-ignore)
    "RecommendedAppHistory" ->
      (Seq("appHandle", "recommendedAppHandle", "position", "capturedAt"), Seq.empty),
    // lib.ts:245-261
    "AppCategoryHistory" ->
      (Seq("appHandle", "categoryHandle", "role", "capturedAt"), Seq("categoryFeatures")),
    // lib.ts:263-279
    "CategoryAppPositionHistory" ->
      (Seq("categoryHandle", "appHandle", "capturedAt"), Seq("position")),
  )

  /** Apply a table's conflict spec: upsert when the spec has update
    * columns, insert-ignore otherwise. `versionCol` orders in-batch
    * duplicates (the reference relies on statement order).
    */
  def write(table: String, existing: DataFrame, incoming: DataFrame,
            versionCol: String): DataFrame = {
    val (keys, updateCols) = specs(table)
    if (updateCols.nonEmpty) WritePath.upsert(existing, incoming, keys, versionCol)
    else WritePath.skipDuplicatesAppend(existing, incoming, keys, versionCol)
  }

  /** F8 (reference `new Date()` injected as createdAt/updatedAt,
    * lib.ts:100, 110, 120, 130, 141, 236, 254): stamp audit columns
    * with the engine clock on the write path. `current_timestamp()` is
    * evaluated once per query, so every row of a batch carries the
    * same stamp — the same semantics as the reference building one
    * `new Date()` per save call. (`new Date() || null` at lib.ts:110
    * is always `new Date()` — JS truthiness quirk — so no null branch
    * exists here either.)
    */
  def stampNow(df: DataFrame, cols: Seq[String] = Seq("createdAt", "updatedAt")): DataFrame =
    cols.foldLeft(df)((d, c) =>
      d.withColumn(c, org.apache.spark.sql.functions.current_timestamp()))
}
