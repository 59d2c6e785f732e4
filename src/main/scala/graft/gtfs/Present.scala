package graft.gtfs

/** Presentation-layer renderers for the reference's three visual
  * outputs (SURVEY §2.1 S9): the top-10 cost bar chart
  * (main.py:86-99, published as docs/images/Figure_1.png), the
  * speed-vs-time line chart (main.py:104-110, Figure_2.png), and the
  * Folium trajectory map (mapping.py:9-37, map.html).
  *
  * Pure string renderers — no plotting library exists in this stack,
  * and none is needed: the charts are SVG documents assembled from
  * the already-aggregated (≤ a few hundred rows) result tables, and
  * the map is the same Leaflet document Folium writes (Folium is a
  * Python templating wrapper over Leaflet.js; we emit the Leaflet
  * calls directly). Everything data-sized stays in Spark; rendering
  * consumes only collected presentation frames, mirroring the
  * reference's `.toPandas()` boundary (main.py:84,102).
  */
object Present {

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")

  /** Round a value range up to a "nice" tick step (1/2/5 × 10^k). */
  private def niceStep(span: Double, nTicks: Int): Double = {
    val raw = span / math.max(1, nTicks)
    val mag = math.pow(10, math.floor(math.log10(raw)))
    val norm = raw / mag
    (if (norm <= 1) 1 else if (norm <= 2) 2 else if (norm <= 5) 5 else 10) * mag
  }

  private case class Frame(w: Int, h: Int, left: Int, right: Int, top: Int, bottom: Int) {
    val plotW: Double = (w - left - right).toDouble
    val plotH: Double = (h - top - bottom).toDouble
  }

  /** Figure_1 analog: vertical bar chart (matplotlib plt.bar with
    * color='skyblue', main.py:90). Labels mirror the reference's
    * (main.py:93-95). */
  def barChartSvg(bars: Seq[(String, Double)], title: String, xLabel: String,
      yLabel: String): String = {
    require(bars.nonEmpty, "bar chart needs at least one bar")
    val f = Frame(1000, 600, 90, 30, 60, 90)
    val yMaxRaw = bars.map(_._2).max
    val step = niceStep(yMaxRaw, 5)
    val yMax = math.ceil(yMaxRaw / step) * step
    def y(v: Double) = f.top + f.plotH * (1.0 - v / yMax)
    val slot = f.plotW / bars.size
    val barW = slot * 0.8
    val sb = new StringBuilder
    sb ++= s"""<svg xmlns="http://www.w3.org/2000/svg" width="${f.w}" height="${f.h}" viewBox="0 0 ${f.w} ${f.h}">"""
    sb ++= s"""<rect width="${f.w}" height="${f.h}" fill="white"/>"""
    // gridlines + y ticks
    var v = 0.0
    while (v <= yMax + 1e-9) {
      val yy = y(v)
      sb ++= f"""<line x1="${f.left}" y1="$yy%.1f" x2="${f.w - f.right}" y2="$yy%.1f" stroke="#dddddd" stroke-width="1"/>"""
      sb ++= f"""<text x="${f.left - 8}" y="${yy + 4}%.1f" text-anchor="end" font-family="sans-serif" font-size="13">${if (step >= 1) f"$v%.0f" else f"$v%.2f"}</text>"""
      v += step
    }
    // bars + x labels
    bars.zipWithIndex.foreach { case ((label, value), i) =>
      val x = f.left + slot * i + (slot - barW) / 2
      val yTop = y(value)
      sb ++= f"""<rect x="$x%.1f" y="$yTop%.1f" width="$barW%.1f" height="${f.top + f.plotH - yTop}%.1f" fill="skyblue"/>"""
      sb ++= f"""<text x="${x + barW / 2}%.1f" y="${f.h - f.bottom + 20}" text-anchor="middle" font-family="sans-serif" font-size="13">${esc(label)}</text>"""
    }
    // axes, labels, title
    sb ++= s"""<line x1="${f.left}" y1="${f.top}" x2="${f.left}" y2="${f.h - f.bottom}" stroke="black"/>"""
    sb ++= s"""<line x1="${f.left}" y1="${f.h - f.bottom}" x2="${f.w - f.right}" y2="${f.h - f.bottom}" stroke="black"/>"""
    sb ++= s"""<text x="${f.w / 2}" y="${f.h - 30}" text-anchor="middle" font-family="sans-serif" font-size="15">${esc(xLabel)}</text>"""
    sb ++= s"""<text x="25" y="${f.h / 2}" text-anchor="middle" font-family="sans-serif" font-size="15" transform="rotate(-90 25 ${f.h / 2})">${esc(yLabel)}</text>"""
    sb ++= s"""<text x="${f.w / 2}" y="35" text-anchor="middle" font-family="sans-serif" font-size="18">${esc(title)}</text>"""
    sb ++= "</svg>"
    sb.toString
  }

  /** Figure_2 analog: time-series line chart (seaborn relplot
    * kind="line", main.py:105). `points` are (epochMillis, value)
    * in plot order. */
  def lineChartSvg(points: Seq[(Long, Double)], seriesName: String,
      title: String, xLabel: String, yLabel: String): String = {
    require(points.nonEmpty, "line chart needs at least one point")
    val f = Frame(1000, 600, 90, 30, 60, 90)
    val (tMin, tMax) = (points.map(_._1).min, points.map(_._1).max)
    val tSpan = math.max(1L, tMax - tMin)
    val yMaxRaw = math.max(1e-9, points.map(_._2).max)
    val step = niceStep(yMaxRaw, 5)
    val yMax = math.ceil(yMaxRaw / step) * step
    def x(t: Long) = f.left + f.plotW * (t - tMin).toDouble / tSpan
    def y(v: Double) = f.top + f.plotH * (1.0 - v / yMax)
    val sb = new StringBuilder
    sb ++= s"""<svg xmlns="http://www.w3.org/2000/svg" width="${f.w}" height="${f.h}" viewBox="0 0 ${f.w} ${f.h}">"""
    sb ++= s"""<rect width="${f.w}" height="${f.h}" fill="white"/>"""
    var v = 0.0
    while (v <= yMax + 1e-9) {
      val yy = y(v)
      sb ++= f"""<line x1="${f.left}" y1="$yy%.1f" x2="${f.w - f.right}" y2="$yy%.1f" stroke="#dddddd"/>"""
      sb ++= f"""<text x="${f.left - 8}" y="${yy + 4}%.1f" text-anchor="end" font-family="sans-serif" font-size="13">$v%.0f</text>"""
      v += step
    }
    // x ticks: 6 evenly spaced, HH:mm (UTC — the pipeline's pinned zone)
    val fmt = java.time.format.DateTimeFormatter.ofPattern("HH:mm")
      .withZone(java.time.ZoneOffset.UTC)
    (0 to 5).foreach { i =>
      val t = tMin + tSpan * i / 5
      sb ++= f"""<text x="${x(t)}%.1f" y="${f.h - f.bottom + 20}" text-anchor="middle" font-family="sans-serif" font-size="12">${fmt.format(java.time.Instant.ofEpochMilli(t))}</text>"""
    }
    val path = points.zipWithIndex.map { case ((t, vv), i) =>
      f"${if (i == 0) "M" else "L"}${x(t)}%.1f ${y(vv)}%.1f"
    }.mkString(" ")
    sb ++= s"""<path d="$path" fill="none" stroke="#4c72b0" stroke-width="1.5"/>"""
    sb ++= s"""<line x1="${f.left}" y1="${f.top}" x2="${f.left}" y2="${f.h - f.bottom}" stroke="black"/>"""
    sb ++= s"""<line x1="${f.left}" y1="${f.h - f.bottom}" x2="${f.w - f.right}" y2="${f.h - f.bottom}" stroke="black"/>"""
    sb ++= s"""<text x="${f.w / 2}" y="${f.h - 30}" text-anchor="middle" font-family="sans-serif" font-size="15">${esc(xLabel)}</text>"""
    sb ++= s"""<text x="25" y="${f.h / 2}" text-anchor="middle" font-family="sans-serif" font-size="15" transform="rotate(-90 25 ${f.h / 2})">${esc(yLabel)}</text>"""
    sb ++= s"""<text x="${f.w / 2}" y="35" text-anchor="middle" font-family="sans-serif" font-size="18">${esc(title)} — ${esc(seriesName)}</text>"""
    sb ++= "</svg>"
    sb.toString
  }

  /** map.html analog: the Leaflet document Folium's `path_map`
    * generates (mapping.py:12-37) — OSM tile layer, one polyline
    * through the trajectory, a green Start and red Koniec marker.
    * One `[lat, lon]` vertex per trajectory row. */
  def polylineMapHtml(points: Seq[(Double, Double)]): String = {
    require(points.nonEmpty, "trajectory map needs at least one point")
    val cLat = points.map(_._1).sum / points.size
    val cLon = points.map(_._2).sum / points.size
    val coords = points.map { case (la, lo) => f"[$la%.6f, $lo%.6f]" }
      .mkString("[", ", ", "]")
    val (sLat, sLon) = points.head
    val (eLat, eLon) = points.last
    f"""<!DOCTYPE html>
       |<html>
       |<head>
       |<meta charset="utf-8"/>
       |<title>Trajectory</title>
       |<link rel="stylesheet" href="https://unpkg.com/leaflet@1.9.4/dist/leaflet.css"/>
       |<script src="https://unpkg.com/leaflet@1.9.4/dist/leaflet.js"></script>
       |<style>#map { width: 100%%; height: 100vh; }</style>
       |</head>
       |<body>
       |<div id="map"></div>
       |<script>
       |var map = L.map('map').setView([$cLat%.6f, $cLon%.6f], 13);
       |L.tileLayer('https://tile.openstreetmap.org/{z}/{x}/{y}.png',
       |  {maxZoom: 19, attribution: '&copy; OpenStreetMap'}).addTo(map);
       |var trail = $coords;
       |L.polyline(trail, {tooltip: 'Coast'}).addTo(map);
       |L.marker([$sLat%.6f, $sLon%.6f]).bindPopup('Start').addTo(map);
       |L.marker([$eLat%.6f, $eLon%.6f]).bindPopup('Koniec').addTo(map);
       |</script>
       |</body>
       |</html>
       |""".stripMargin
  }
}
