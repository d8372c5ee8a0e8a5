package graft.report

import graft.profiler.{ColumnProfile, TableProfile}

/** User-swappable render hooks — the Scala analogue of the
  * reference's jinja2 template-override mechanism
  * (spark_df_profiling/templates.py::template ≈L10–80, where callers
  * swap row/base templates by name). Instead of a string-template
  * registry (stringly-typed, runtime-failing), each override point is
  * a typed function with the stock renderer as its default:
  *
  * {{{
  *   // reference:  templates.template("base") = my_jinja_template
  *   HtmlReport.render(profile,
  *     templates = ReportTemplates(
  *       statRow = (k, v) => s"<tr class='my'><th>$k</th><td>$v</td></tr>",
  *       css = myCss))
  *   // matplotlib-parity histograms (base64 PNG data-URIs):
  *   HtmlReport.render(profile, templates = ReportTemplates.pngHistograms)
  * }}}
  */
final case class ReportTemplates(
    /** One key/value row inside a stats table. Receives RAW strings —
      * implementations escape (the default uses [[HtmlReport.statRow]],
      * which does). */
    statRow: (String, String) => String = HtmlReport.statRow,
    /** Per-column histogram renderer; (bin, count) pairs in. */
    histogram: Seq[(Long, Long)] => String = HtmlReport.svgHistogram,
    /** Page stylesheet (the `<style>` body). */
    css: String = HtmlReport.defaultCss,
    /** Outer document: (escaped title, css, body html) → page. */
    pageShell: (String, String, String) => String =
      HtmlReport.defaultShell)

object ReportTemplates {
  /** Reference-parity histograms: base64 PNG `<img>` data-URIs, as
    * matplotlib produces, instead of inline SVG. */
  val pngHistograms: ReportTemplates =
    ReportTemplates(histogram = ChartPng.histogramImg)
}

/** Self-contained HTML rendering of a [[TableProfile]] — the
  * Spark-native analogue of the reference's jinja2 + matplotlib layer
  * (spark_df_profiling/templates/ *.html, base.py::to_html ≈L400–470,
  * formatters.py). Histograms render as inline SVG bars instead of
  * base64 PNGs (no matplotlib dependency); formatters mirror
  * formatters.py's fmt_percent / fmt_bytesize / numeric formatting. */
object HtmlReport {

  // ---- formatters (reference: spark_df_profiling/formatters.py) ----

  def fmtPercent(v: Double): String = f"${v * 100}%.1f%%"

  def fmtNumber(v: Double): String =
    if (v == v.floor && math.abs(v) < 1e15) f"${v.toLong}%,d"
    else if (math.abs(v) >= 1e6 || (v != 0 && math.abs(v) < 1e-3))
      f"$v%.5e"
    else f"$v%.5f"

  def fmtBytesize(n: Double): String = {
    val units = Seq("B", "KiB", "MiB", "GiB", "TiB", "PiB")
    var v = n; var i = 0
    while (math.abs(v) >= 1024.0 && i < units.size - 1) { v /= 1024.0; i += 1 }
    f"$v%.1f ${units(i)}"
  }

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;").replace("'", "&#39;")

  def statRow(k: String, v: String): String =
    s"<tr><th>${esc(k)}</th><td>${esc(v)}</td></tr>"

  /** Default histogram renderer: inline SVG bars (16 px per bin,
    * 60 px max bar height) — see [[ChartPng.histogramImg]] for the
    * PNG-parity alternative with identical geometry. */
  def svgHistogram(h: Seq[(Long, Long)]): String = {
    if (h.isEmpty) return ""
    val maxC = math.max(1L, h.map(_._2).max)
    val bars = h.map { case (bin, cnt) =>
      val hgt = math.max(1, (cnt * 60) / maxC)
      s"""<rect x="${bin * 16}" y="${62 - hgt}" width="14" height="$hgt" class="bar"><title>bin $bin: $cnt</title></rect>"""
    }.mkString
    s"""<svg width="${h.map(_._1).max * 16 + 16}" height="64" class="hist">$bars</svg>"""
  }

  private def columnCard(c: ColumnProfile,
      t: ReportTemplates = ReportTemplates()): String = {
    val statRow = t.statRow
    val common = Seq(
      statRow("Type", c.kind),
      statRow("Count", fmtNumber(c.count.toDouble)),
      statRow("Missing",
        s"${fmtNumber(c.missing.toDouble)} (${fmtPercent(c.pMissing)})"),
      statRow("Distinct", fmtNumber(c.distinct.toDouble)),
      statRow("Unique", fmtPercent(c.pUnique)))
    val numeric = Seq("mean" -> "Mean", "min" -> "Min", "max" -> "Max",
      "sum" -> "Sum", "sd" -> "Std dev", "var" -> "Variance",
      "sk" -> "Skewness", "ku" -> "Kurtosis", "n_zeros" -> "Zeros")
      .flatMap { case (k, label) =>
        c.stats.get(k).map(v => statRow(label, fmtNumber(v)))
      }
    val dates = Seq("dmn" -> "Min", "dmx" -> "Max").flatMap {
      case (k, label) => c.stats.get(k).map { us =>
        statRow(label, java.time.Instant
          .ofEpochMilli((us / 1000.0).toLong).toString)
      }
    }
    val quant = Seq("p05" -> "5%", "q1" -> "Q1", "median" -> "Median",
      "q3" -> "Q3", "p95" -> "95%").flatMap { case (k, label) =>
        c.quantiles.get(k).map(v => statRow(label, fmtNumber(v)))
      }
    val freq =
      if (c.topValues.isEmpty) ""
      else "<table class='freq'><tr><th>Value</th><th>Count</th></tr>" +
        c.topValues.map { case (v, n) =>
          s"<tr><td>${esc(v)}</td><td>$n</td></tr>"
        }.mkString + "</table>"
    s"""<div class="col card" id="col-${esc(c.name)}">
       |<h3>${esc(c.name)} <span class="kind">${c.kind}</span></h3>
       |<div class="row">
       |<table class="stats">${(common ++ numeric ++ dates ++ quant).mkString}</table>
       |${t.histogram(c.histogram)}
       |$freq
       |</div></div>""".stripMargin
  }

  /** Quality-gate section: one row per evaluated check — the
    * [[graft.ops.Quality.runChecks]] output shape (check_type,
    * col_name, observed, lo, hi, passed) — with a pass/fail banner.
    * Empty input renders nothing (reports without a declared suite
    * are unchanged). */
  def qualitySection(
      checks: Seq[(String, String, Double, Double, Double, Long)])
      : String =
    if (checks.isEmpty) ""
    else {
      val nPass = checks.count(_._6 == 1L)
      val cls = if (nPass == checks.size) "qc-pass" else "qc-fail"
      val rows = checks.map { case (typ, cn, obs, lo, hi, passed) =>
        val badge = if (passed == 1L) """<span class="ok">pass</span>"""
          else """<span class="bad">FAIL</span>"""
        s"<tr><td>${esc(typ)}</td><td>${esc(cn)}</td>" +
          s"<td>${fmtNumber(obs)}</td>" +
          s"<td>[${fmtNumber(lo)}, ${fmtNumber(hi)}]</td>" +
          s"<td>$badge</td></tr>"
      }
      s"""<div class="card $cls"><h2>Quality checks
         |($nPass/${checks.size} passed)</h2><table class="freq">
         |<tr><th>check</th><th>column</th><th>observed</th>
         |<th>bounds</th><th>result</th></tr>
         |${rows.mkString("\n")}</table></div>""".stripMargin
    }

  /** Joint-histogram heatmap: an SVG grid over
    * [[graft.profiler.Stats.histogram2d]] output (bx, by, cnt) —
    * the ridge two 1D histograms can't show. Cell darkness is
    * cnt/max; empty input renders nothing. */
  def heatmapSection(cells: Seq[(Long, Long, Long)],
      xLabel: String, yLabel: String, bins: Int = 10): String =
    if (cells.isEmpty) ""
    else {
      val mx = math.max(1L, cells.map(_._3).max).toDouble
      val sz = 18
      val rects = cells.map { case (bx, by, cnt) =>
        val o = math.max(0.08, cnt / mx)
        // SVG y grows downward; flip so by=0 sits at the bottom
        s"""<rect x="${bx * sz}" y="${(bins - 1 - by) * sz}" """ +
          s"""width="${sz - 1}" height="${sz - 1}" class="cell" """ +
          f"""opacity="$o%.2f"><title>$cnt</title></rect>"""
      }
      s"""<div class="card"><h2>Joint histogram
         |(${esc(xLabel)} &times; ${esc(yLabel)})</h2>
         |<svg width="${bins * sz}" height="${bins * sz}"
         |class="heatmap">${rects.mkString}</svg></div>""".stripMargin
    }

  /** Privacy-audit section: the [[graft.ops.Privacy.riskCurve]]
    * output (k, groups_at_risk, rows_at_risk, share_at_risk) plus
    * the headline smallest-group size — "what would a k-anonymous
    * release of this table cost". Empty input renders nothing. */
  def privacySection(minGroup: Long,
      curve: Seq[(Long, Long, Long, Double)]): String =
    if (curve.isEmpty) ""
    else {
      // pass only when the STRICTEST candidate k is satisfied — a
      // release failing any larger target must not render green
      val cls = if (minGroup >= curve.map(_._1).max) "qc-pass"
        else "qc-fail"
      val rows = curve.map { case (k, g, r, s) =>
        s"<tr><td>$k</td><td>$g</td><td>$r</td>" +
          s"<td>${fmtPercent(s)}</td></tr>"
      }
      s"""<div class="card $cls"><h2>Privacy audit
         |(smallest QI group: $minGroup)</h2><table class="freq">
         |<tr><th>k</th><th>groups&lt;k</th><th>rows&lt;k</th>
         |<th>share at risk</th></tr>
         |${rows.mkString("\n")}</table></div>""".stripMargin
    }

  /** Domain-mix datasheet section:
    * [[graft.ops.UrlOps.domainProfile]] output rows (domain, docs,
    * tokens, hosts, doc share, hot flag) — hot domains badged and
    * counted in the header; rows rendered share-descending (the
    * reading order of a crawl datasheet). Empty input renders
    * nothing. */
  def domainSection(
      rows: Seq[(String, Long, Long, Long, Double, Boolean)]): String =
    if (rows.isEmpty) ""
    else {
      val nHot = rows.count(_._6)
      val trs = rows.sortBy(-_._5).map {
        case (d, docs, toks, hosts, share, hot) =>
          val badge =
            if (hot) """ <span class="bad">HOT</span>""" else ""
          s"<tr><td>${esc(d)}$badge</td><td>$docs</td><td>$toks</td>" +
            s"<td>$hosts</td><td>${fmtPercent(share)}</td></tr>"
      }
      s"""<div class="card"><h2>Domain mix
         |(${rows.size} domains, $nHot hot)</h2><table class="freq">
         |<tr><th>domain</th><th>docs</th><th>tokens</th>
         |<th>hosts</th><th>doc share</th></tr>
         |${trs.mkString("\n")}</table></div>""".stripMargin
    }

  /** Quality-gate funnel section:
    * [[graft.ops.QualityRules.filterFunnel]] output rows (rule_idx,
    * rule, n_docs, share, n_surviving) — rules rendered in
    * evaluation order with the survival curve; rules eating more
    * than 20% of the corpus badged. Empty input renders nothing. */
  def funnelSection(
      rows: Seq[(Long, String, Long, Double, Long)]): String =
    if (rows.isEmpty) ""
    else {
      val kept = rows.find(_._2 == "kept").map(_._3).getOrElse(0L)
      val total = rows.filter(_._2 != "kept").map(_._3).sum + kept
      val trs = rows.sortBy(_._1).map {
        case (_, rule, n, share, surviving) =>
          val badge =
            if (rule != "kept" && share > 0.2)
              """ <span class="bad">EATING</span>""" else ""
          s"<tr><td>${esc(rule)}$badge</td><td>$n</td>" +
            s"<td>${fmtPercent(share)}</td><td>$surviving</td></tr>"
      }
      s"""<div class="card"><h2>Quality gate
         |($kept of $total kept)</h2><table class="freq">
         |<tr><th>rule</th><th>first-fail docs</th>
         |<th>share</th><th>surviving</th></tr>
         |${trs.mkString("\n")}</table></div>""".stripMargin
    }

  /** Standalone corpus-datasheet DOCUMENT from the melted
    * [[graft.ops.Datasheet.corpusDatasheet]] rows: one card per
    * section, entities as table rows, metrics as columns — the
    * publishable "datasheets for datasets" artifact. Counts render
    * as integers, shares as percentages, other floats as-is. */
  def datasheetHtml(rows: Seq[(String, String, String, Double)],
      title: String = "corpus datasheet"): String = {
    // integer-vs-float decided by metric NAME, not by the value's
    // floor equality — a float metric that happens to land on an
    // integral value (avg_quality exactly 1.0) must not switch to
    // integer style mid-column. Count metrics are known by
    // convention: n_* and the is_hot flag.
    def fmt(metric: String, v: Double): String =
      if (metric.contains("share")) fmtPercent(v)
      else if (metric.startsWith("n_") || metric == "is_hot" ||
        Set("tp", "fp", "tn", "fn")(metric))
        fmtNumber(v)
      else f"$v%.5g"
    val cards = rows.groupBy(_._1).toSeq.sortBy(_._1).map {
      case (section, rs) =>
        val metrics = rs.map(_._3).distinct.sorted
        val ents = rs.groupBy(_._2).toSeq.sortBy(_._1)
        val head = metrics.map(m => s"<th>${esc(m)}</th>")
          .mkString
        val trs = ents.map { case (e, er) =>
          val vals = er.map(r => r._3 -> r._4).toMap
          val tds = metrics.map(m => "<td>" +
            vals.get(m).map(fmt(m, _)).getOrElse("") + "</td>")
          s"<tr><td>${esc(e)}</td>${tds.mkString}</tr>"
        }
        s"""<div class="card"><h2>${esc(section)}</h2>
           |<table class="freq"><tr><th>entity</th>$head</tr>
           |${trs.mkString("\n")}</table></div>""".stripMargin
    }
    s"""<!DOCTYPE html><html><head><meta charset="utf-8">
       |<title>${esc(title)}</title><style>
       |body{font-family:sans-serif;margin:2em;background:#fafafa}
       |.card{background:#fff;border:1px solid #ddd;border-radius:6px;
       |  padding:1em;margin-bottom:1em}
       |table.freq{border-collapse:collapse}
       |table.freq td,table.freq th{border:1px solid #eee;
       |  padding:2px 8px}
       |</style></head><body><h1>${esc(title)}</h1>
       |${cards.mkString("\n")}
       |</body></html>""".stripMargin
  }

  /** Metric-history anomaly section:
    * [[graft.profiler.ProfileStore.metricAnomaly]] output rows
    * (part, col_name, metric, z, anomalous) — "which ingest day
    * looks wrong" — flagged rows badged and counted in the header.
    * Empty input renders nothing. */
  def anomalySection(
      rows: Seq[(String, String, Double, Option[Double], Long)])
      : String =
    if (rows.isEmpty) ""
    else {
      val nBad = rows.count(_._5 == 1L)
      val cls = if (nBad == 0) "qc-pass" else "qc-fail"
      val trs = rows.map { case (part, cn, m, z, anom) =>
        val badge = if (anom == 1L) """<span class="bad">ANOMALY</span>"""
          else """<span class="ok">ok</span>"""
        s"<tr><td>${esc(part)}</td><td>${esc(cn)}</td>" +
          s"<td>${fmtNumber(m)}</td>" +
          s"<td>${z.map(fmtNumber).getOrElse("&mdash;")}</td>" +
          s"<td>$badge</td></tr>"
      }
      s"""<div class="card $cls"><h2>Ingest history
         |($nBad anomalous)</h2><table class="freq">
         |<tr><th>snapshot</th><th>column</th><th>mean</th>
         |<th>robust z</th><th>result</th></tr>
         |${trs.mkString("\n")}</table></div>""".stripMargin
    }

  def render(p: TableProfile, title: String = "graft profile",
      sample: Seq[Seq[String]] = Seq.empty,
      quality: Seq[(String, String, Double, Double, Double, Long)] =
        Seq.empty,
      heatmap: Seq[(Long, Long, Long)] = Seq.empty,
      heatmapLabels: (String, String) = ("x", "y"),
      anomalies: Seq[(String, String, Double, Option[Double], Long)] =
        Seq.empty,
      privacy: Seq[(Long, Long, Long, Double)] = Seq.empty,
      privacyMinGroup: Long = 0L,
      domains: Seq[(String, Long, Long, Long, Double, Boolean)] =
        Seq.empty,
      templates: ReportTemplates = ReportTemplates()): String = {
    val statRow = templates.statRow
    val size =
      if (p.sizeBytes <= 0) Seq.empty
      else Seq(
        statRow("Total size", fmtBytesize(p.sizeBytes.toDouble)),
        statRow("Average record size",
          fmtBytesize(p.sizeBytes.toDouble / math.max(1L, p.n))))
    val overview =
      s"""<div class="card"><h2>Overview</h2><table class="stats">
         |${statRow("Number of rows", fmtNumber(p.n.toDouble))}
         |${statRow("Number of variables", p.nvar.toString)}
         |${statRow("Total missing", fmtPercent(p.pMissing))}
         |${size.mkString("\n")}
         |${statRow("Rejected variables", p.rejected.size.toString)}
         |</table></div>""".stripMargin
    val warnings =
      if (p.warnings.isEmpty) ""
      else s"""<div class="card warnings"><h2>Warnings</h2><ul>${p.warnings
        .map(w => s"<li>${esc(w)}</li>").mkString}</ul></div>"""
    val sampleHtml =
      if (sample.isEmpty) ""
      else {
        val rows = sample.map(r =>
          "<tr>" + r.map(v => s"<td>${esc(v)}</td>").mkString + "</tr>")
        s"""<div class="card"><h2>Sample</h2><table class="freq">${rows.mkString}</table></div>"""
      }
    val spearmanHtml =
      if (p.spearman.isEmpty) ""
      else {
        val rows = p.spearman.map { case (a, b, rho) =>
          s"<tr><td>${esc(a)}</td><td>${esc(b)}</td>" +
            s"<td>${fmtNumber(rho)}</td></tr>"
        }
        s"""<div class="card"><h2>Spearman rank correlations
           |(&rho;)</h2><table class="freq">
           |<tr><th>column</th><th>column</th><th>&rho;</th></tr>
           |${rows.mkString("\n")}</table></div>""".stripMargin
      }
    val assocHtml =
      if (p.catAssociations.isEmpty) ""
      else {
        val rows = p.catAssociations.map { case (a, b, v) =>
          s"<tr><td>${esc(a)}</td><td>${esc(b)}</td>" +
            s"<td>${fmtNumber(v)}</td></tr>"
        }
        s"""<div class="card"><h2>Categorical associations
           |(Cram&eacute;r's V)</h2><table class="freq">
           |<tr><th>column</th><th>column</th><th>V</th></tr>
           |${rows.mkString("\n")}</table></div>""".stripMargin
      }
    val body =
      s"""$overview
         |$warnings
         |${qualitySection(quality)}
         |${privacySection(privacyMinGroup, privacy)}
         |${domainSection(domains)}
         |${anomalySection(anomalies)}
         |${heatmapSection(heatmap, heatmapLabels._1, heatmapLabels._2)}
         |$spearmanHtml
         |$assocHtml
         |${p.columns.map(columnCard(_, templates)).mkString("\n")}
         |$sampleHtml""".stripMargin
    templates.pageShell(esc(title), templates.css, body)
  }

  val defaultCss: String =
    """body{font-family:sans-serif;margin:2em;background:#fafafa}
      |.card{background:#fff;border:1px solid #ddd;border-radius:6px;
      |  padding:1em;margin-bottom:1em}
      |.col .row{display:flex;gap:2em;align-items:flex-start}
      |table.stats th{text-align:left;padding-right:1em;color:#555}
      |table.freq{border-collapse:collapse}
      |table.freq td,table.freq th{border:1px solid #eee;padding:2px 8px}
      |.kind{font-size:0.7em;color:#888;border:1px solid #ccc;
      |  border-radius:4px;padding:1px 5px}
      |.hist .bar{fill:#337ab7}
      |.heatmap .cell{fill:#337ab7}
      |.warnings li{color:#8a6d3b}
      |.qc-pass h2{color:#3c763d}
      |.qc-fail h2{color:#a94442}
      |.ok{color:#3c763d;font-weight:bold}
      |.bad{color:#a94442;font-weight:bold}""".stripMargin

  def defaultShell(escTitle: String, css: String, body: String)
      : String =
    s"""<!DOCTYPE html><html><head><meta charset="utf-8">
       |<title>$escTitle</title><style>
       |$css
       |</style></head><body>
       |<h1>$escTitle</h1>
       |$body
       |</body></html>""".stripMargin
}
